"""Command-line app: the samples/EKF/main.cpp equivalent.

    python -m openekfmonoslam_tpu.cli CONFIG SOURCE [OUTPUT] [options]

SOURCE is a directory of %05d-numbered PNG frames (FileSequenceImage
Generator semantics, main.cpp:50), a video file, or ``camera[:N]`` for a
live capture device.  Runs EKF init + step over the sequence (main.cpp:
123-167), writes records/output.yml (+ rendered overlays with --render),
and emits the resultReader MATLAB report.

Modes:
  --mode interactive   one device call per frame (default; supports
                       --render overlays and live sources)
  --mode scan          device-resident lax.scan over preloaded frames
                       (maximum throughput; file sequences only)
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_source(spec: str, begin: int, end: int,
                 realtime_fps: float = 0.0):
    from openekfmonoslam_tpu.io import native_loader
    from openekfmonoslam_tpu.io.sources import (
        CameraSource,
        FileSequenceOnDemandSource,
        FileSequenceSource,
        VideoFileSource,
    )

    if spec.startswith("camera"):
        dev = int(spec.split(":")[1]) if ":" in spec else 0
        return CameraSource(dev)
    if os.path.isdir(spec):
        if realtime_fps > 0:
            # real-time simulation: frames skip with the wall clock
            # (FileSequenceOnDemandImageGenerator semantics)
            return FileSequenceOnDemandSource(spec, begin, end,
                                              frame_rate=realtime_fps)
        if native_loader.available():
            paths = native_loader.file_sequence_paths(spec, begin, end)
            paths = [p for p in paths if os.path.exists(p)]
            if paths:
                return native_loader.NativeFrameLoader(paths)
        return FileSequenceSource(spec, begin, end)
    return VideoFileSource(spec)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="reference-format YML config file")
    ap.add_argument("source", help="frame directory / video file / camera[:N]")
    ap.add_argument("output", nargs="?", default=None,
                    help="output directory (records, output.yml, report)")
    ap.add_argument("--begin", type=int, default=1)
    ap.add_argument("--end", type=int, default=99999)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--mode", choices=("interactive", "scan"),
                    default="interactive")
    ap.add_argument("--render", action="store_true",
                    help="write overlay PNGs + video (EKF.cpp:294-305)")
    ap.add_argument("--render-debug", action="store_true",
                    help="write RANSAC inlier/outlier + new-feature debug "
                         "overlays to OUTPUT/debug (DEBUG_SHOW_RANSAC_INFO"
                         "/DEBUG_SHOW_NEW_FEATURES, EKF.cpp:198-222,542-544)")
    ap.add_argument("--max-features", type=int, default=None)
    ap.add_argument("--matcher", choices=("descriptor", "ncc"), default=None,
                    help="guided-matching backend: detected-keypoint "
                         "descriptors (reference Matching.cpp) or NCC "
                         "patch correlation (Davison active search)")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save an exact-resume checkpoint to "
                         "OUTPUT/checkpoint.npz every N frames")
    ap.add_argument("--resume", default=None,
                    help="restore a checkpoint before processing "
                         "(frames should continue where the saved run left "
                         "off)")
    ap.add_argument("--realtime", type=float, default=0.0, metavar="FPS",
                    help="treat the frame directory as a live source at "
                         "FPS: skip frames by wall-clock time "
                         "(FileSequenceOnDemandImageGenerator)")
    ap.add_argument("--progress", type=int, default=30)
    ap.add_argument("--phase-timing", action="store_true",
                    help="emit the reference's 7-phase per-frame timings "
                         "(EKF.cpp:255-618) into records/output.yml; "
                         "interactive mode brackets each jitted phase, "
                         "scan mode attributes the per-frame budget by a "
                         "calibration pass")
    ap.add_argument("--keyframe-every", type=int, default=0,
                    help="enable the keyframe pose-graph layer: snapshot "
                         "a keyframe every N frames; loop closures are "
                         "detected on relocalization and the optimized "
                         "trajectory is exported to OUTPUT")
    ap.add_argument("--relocalize-after", type=int, default=0,
                    help="auto map-reset after N consecutive lost frames")
    ap.add_argument("--viz3d", type=int, default=0, metavar="N",
                    help="write a 3D map/trajectory debug view "
                         "(map3d_%%05d.png) every N frames (the "
                         "reference's PCL viewer, Draw.h:88-100, rendered "
                         "headlessly)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    overrides = {}
    if args.max_features:
        overrides["max_features"] = args.max_features
    if args.matcher:
        overrides["matcher"] = args.matcher
        if args.matcher == "ncc":
            # NCC stores appearance patches in the descriptor slots
            from openekfmonoslam_tpu.config import DescriptorConfig
            overrides["descriptor"] = DescriptorConfig(kind="PATCH")

    from openekfmonoslam_tpu.engine.engine import SlamEngine, run_sequence
    from openekfmonoslam_tpu.eval.result_reader import emit_matlab_report
    from openekfmonoslam_tpu.eval.trajectory import summarize

    src = build_source(args.source, args.begin, args.end, args.realtime)

    if args.mode == "scan":
        import numpy as np

        from openekfmonoslam_tpu.engine.scan_runner import (
            phase_share_calibration,
            run_sequence_on_device,
        )
        from openekfmonoslam_tpu.engine.step import SlamRuntime
        from openekfmonoslam_tpu.config import (
            auto_max_features,
            load_config,
        )
        import dataclasses

        cfg = load_config(args.config)
        cfg = dataclasses.replace(
            cfg, max_features=overrides.get(
                "max_features", auto_max_features(cfg.ekf)))
        rt = SlamRuntime(cfg)
        frames = []
        for i, f in enumerate(src):
            if args.max_frames is not None and i >= args.max_frames:
                break
            frames.append(f)
        frames = np.stack(frames)
        t0 = time.perf_counter()
        state, records = run_sequence_on_device(rt, frames, chunk=64)
        dt = time.perf_counter() - t0
        print(f"{len(frames)-1} frames in {dt:.2f}s "
              f"({(len(frames)-1)/dt:.1f} fps incl. compile)")
        summary = summarize(records)
        print(summary)
        if args.output:
            from openekfmonoslam_tpu.eval.result_reader import (
                records_to_dicts,
                write_output_yml,
            )
            os.makedirs(args.output, exist_ok=True)
            np.save(os.path.join(args.output, "x_cam.npy"),
                    np.asarray(records.x_cam))
            shares, frame_us = None, None
            if args.phase_timing:
                # calibration: bracket the 7 phases over a few frames and
                # attribute the measured scan budget by their shares (the
                # fused scan cannot be bracketed from the host)
                shares = phase_share_calibration(rt, frames[:9])
                frame_us = dt / max(len(frames) - 1, 1) * 1e6
            dicts = records_to_dicts(records, phase_shares=shares,
                                     frame_time_us=frame_us)
            write_output_yml(dicts,
                             os.path.join(args.output, "output.yml"))
            emit_matlab_report(dicts, args.output)
        return

    engine = SlamEngine(args.config, output_path=args.output,
                        render=args.render, render_debug=args.render_debug,
                        phase_timing=args.phase_timing,
                        keyframe_every=args.keyframe_every,
                        relocalize_after=args.relocalize_after,
                        viz3d_every=args.viz3d,
                        **overrides)
    ckpt_path = (os.path.join(args.output, "checkpoint.npz")
                 if args.output else "checkpoint.npz")
    if args.resume:
        engine.resume(args.resume)
    t0 = time.perf_counter()
    if args.resume or args.checkpoint_every:
        # per-frame loop with checkpointing; resume skips EKF::init
        it = iter(src)
        if not args.resume:
            engine.init(next(it))
        for i, frame in enumerate(it):
            if args.max_frames is not None and i >= args.max_frames:
                break
            rec = engine.step(frame)
            if (args.checkpoint_every
                    and rec["frame"] % args.checkpoint_every == 0):
                engine.save_checkpoint(ckpt_path)
            if args.progress and (i + 1) % args.progress == 0:
                print(f"frame {rec['frame']}: "
                      f"matches={rec['total_matches']}")
    else:
        run_sequence(engine, src, max_frames=args.max_frames,
                     progress_every=args.progress)
    dt = time.perf_counter() - t0
    print(f"total {dt:.2f}s for {len(engine.records)} frames "
          f"({len(engine.records)/max(dt,1e-9):.1f} fps)")
    print(summarize(engine.records))
    if args.output:
        emit_matlab_report(engine.records, args.output)
    if (engine.loop_closer is not None and engine.loop_closer.closures
            and args.output):
        # export the drift-corrected trajectory alongside the raw one
        import numpy as np

        from openekfmonoslam_tpu.eval.result_reader import write_points3d
        corrected = engine.corrected_trajectory()
        np.save(os.path.join(args.output, "trajectory_corrected.npy"),
                corrected)
        write_points3d(
            os.path.join(args.output, "cameraPositionsCorrected.m"),
            "cameraPositionsCorrected", corrected)
        with open(os.path.join(args.output, "loop_closures.json"),
                  "w") as f:
            json.dump([{k: (v.tolist() if hasattr(v, "tolist")
                            else float(v) if isinstance(v, float) else v)
                        for k, v in c.items()}
                       for c in engine.loop_closer.closures], f, indent=2)
        print(f"{len(engine.loop_closer.closures)} loop closure(s); "
              "corrected trajectory written")
    engine.close()


if __name__ == "__main__":
    main()
