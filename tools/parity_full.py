"""Full-sequence reference parity artifact (VERDICT r2 #4).

Records ONE injection log from a live engine run over the complete
720-frame s3 sequence, replays it through

  * the TPU engine filter (step_injected),
  * the correct-math oracle (quirks off),
  * the bug-compatible reference oracle (quirks on),
  * single-quirk-off oracle variants,

and writes runs/parity_full/: the ATE-vs-frame curve, per-variant
trajectories, and summary.json with the numbers BASELINE.md cites.

Run: python tools/parity_full.py  (TPU or CPU; ~6 min)
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, ".")

import jax

# parity is a float64 measurement: run on CPU (the tunneled TPU silently
# computes f32, which diverges from the f64 NumPy oracle), like the
# oracle-parity tests (tests/conftest.py pins the same)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.eval.oracle import OracleQuirks, replay_log
from openekfmonoslam_tpu.eval.replay import (record_live_log,
                                             replay_through_engine)
from openekfmonoslam_tpu.eval.trajectory import ate_rmse
from openekfmonoslam_tpu.io.sources import FileSequenceSource

FRAMES_DIR = "/root/reference/experiments/s3/costado_recto1"
VIDEO = ("/root/reference/kalmanFilter/resources/videos/s3/video4/"
         "escritorio_traslacion.mp4")
CONFIG = "/root/reference/experiments/s3/config.yml"
N_FRAMES = 720


def load_video_frames():
    """The bundled desk-translation mp4 (359 frames, 640x480)."""
    import cv2

    cap = cv2.VideoCapture(VIDEO)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2GRAY))
    cap.release()
    return np.stack(frames)


def main():
    video = "--video" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else (
        "runs/parity_video" if video else "runs/parity_full")
    os.makedirs(out_dir, exist_ok=True)

    cfg = load_config(CONFIG)
    cfg = dataclasses.replace(
        cfg, max_features=auto_max_features(cfg.ekf), dtype="float64",
        ransac_parity_visit=True, max_hypotheses=1000)
    rt = SlamRuntime(cfg)

    if video:
        frames = load_video_frames()
    else:
        frames = np.stack(list(FileSequenceSource(FRAMES_DIR, 1, N_FRAMES)))
    print(f"recording live injection log over {len(frames)} frames ...")
    log = record_live_log(rt, frames, chunk=40)

    print("replaying through engine ...")
    engine = replay_through_engine(rt, log)[:, 0:3]

    print("replaying through engine with reference_quirks ...")
    rt_q = SlamRuntime(dataclasses.replace(cfg, reference_quirks=True))
    engine_quirks = replay_through_engine(rt_q, log)[:, 0:3]

    variants = {
        "oracle_correct": OracleQuirks.none(),
        "oracle_reference": OracleQuirks(),
        "ref_minus_jacobian_slip": dataclasses.replace(
            OracleQuirks(), jacobian_slip=False),
        "ref_minus_rho_unrotated": dataclasses.replace(
            OracleQuirks(), rho_unrotated=False),
        "ref_minus_deadband": dataclasses.replace(
            OracleQuirks(), deadband=False),
    }
    trajs = {"engine": engine, "engine_quirks": engine_quirks}
    for name, q in variants.items():
        print(f"replaying {name} ...")
        trajs[name] = np.stack(replay_log(cfg, log, q).trajectory)[:, 0:3]

    ref = trajs["oracle_reference"]
    path = np.concatenate([
        [0.0], np.cumsum(np.linalg.norm(np.diff(ref, axis=0), axis=1))])
    dev = np.linalg.norm(engine - ref, axis=1)

    summary = {"n_frames": int(len(engine)), "path_length": float(path[-1])}
    for name, t in trajs.items():
        if name == "engine":
            continue
        n = min(len(engine), len(t))
        summary[f"ate_engine_vs_{name}"] = float(
            ate_rmse(engine[:n], t[:n], align=False))
    # the bug-compatible engine vs the bug-compatible oracle: the
    # unconditional parity number (machine precision expected)
    nq = min(len(engine_quirks), len(ref))
    summary["ate_engine_quirks_vs_oracle_reference"] = float(
        ate_rmse(engine_quirks[:nq], ref[:nq], align=False))
    # quirk attribution: how much of the engine-vs-reference gap does
    # disabling each quirk in the oracle close?
    for name in ("ref_minus_jacobian_slip", "ref_minus_rho_unrotated",
                 "ref_minus_deadband"):
        n = min(len(ref), len(trajs[name]))
        summary[f"quirk_ate_{name[10:]}"] = float(
            ate_rmse(ref[:n], trajs[name][:n], align=False))
    # prefix bound (the round-2 regime) for continuity
    k = 121
    summary["ate_engine_vs_reference_first120"] = float(
        ate_rmse(engine[:k], ref[:k], align=False))
    summary["path_first120"] = float(path[k - 1])
    summary["max_dev"] = float(dev.max())
    summary["ate_pct_of_path"] = float(
        100.0 * summary["ate_engine_vs_oracle_reference"] / path[-1])

    np.savez_compressed(
        os.path.join(out_dir, "trajectories.npz"),
        path=path, dev=dev, **{k: v for k, v in trajs.items()})
    curve = np.stack([np.arange(len(dev)), path[:len(dev)], dev], axis=1)
    np.savetxt(os.path.join(out_dir, "ate_vs_frame.csv"), curve,
               header="frame,path_m,deviation_m", delimiter=",",
               comments="")
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
