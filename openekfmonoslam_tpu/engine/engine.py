"""Host-side engine: the reference's 3-call public API, plus outputs.

The reference's entire public surface is ``EKF(configFile, outputPath)``,
``EKF::init(image)``, ``EKF::step(image)`` with direct access to ``state``
and ``stateCovarianceMatrix`` (EKF.h:41-63).  SlamEngine mirrors that:

    engine = SlamEngine("config.yml", output_path="out/")
    engine.init(first_frame)          # EKF::init
    for frame in frames:
        record = engine.step(frame)   # EKF::step
    engine.state_vector, engine.covariance   # state access
    engine.close()

Per-frame records carry the same observables the reference writes to
output.yml (state, 13x13 covariance corner, match/inlier counts, per-phase
wall times; EKF.cpp:405-628), emitted as JSONL plus an output.yml-like YAML
for the resultReader-equivalent tooling in openekfmonoslam_tpu.eval.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import SlamConfig, auto_max_features, load_config
from openekfmonoslam_tpu.engine.step import SlamRuntime, StepRecord
from openekfmonoslam_tpu.io.sources import to_gray


class SlamEngine:
    def __init__(self, config: "str | SlamConfig",
                 output_path: Optional[str] = None, render: bool = False,
                 render_debug: bool = False,
                 keyframe_every: int = 0, keyframe_capacity: int = 256,
                 relocalize_after: int = 0, lost_matches_threshold: int = 4,
                 phase_timing: bool = False, viz3d_every: int = 0,
                 **overrides):
        if isinstance(config, str):
            cfg = load_config(config)
            if "max_features" not in overrides:
                overrides["max_features"] = auto_max_features(cfg.ekf)
            import dataclasses
            cfg = dataclasses.replace(cfg, **overrides)
        else:
            cfg = config
        self.config = cfg
        self.runtime = SlamRuntime(cfg)
        self._init_fn, self._step_fn = self.runtime.jitted()
        # ONE packed per-frame summary vector: every device->host fetch
        # costs full transfer latency regardless of size (measured ~25 ms
        # over the tunneled TPU, ~50 us locally), and the record dict
        # needs 11 values -- fetching them individually made the
        # interactive loop fetch-latency-bound (247 ms/frame measured).
        # Layout: x_cam (13) | P_cam.ravel (169) | 7 counters.
        def _summary(state, rec):
            counters = jnp.stack([
                rec.total_matches, rec.li_inliers, rec.hi_inliers,
                rec.n_active, rec.n_visible,
                jnp.sum((state.active & state.is_xyz).astype(jnp.int32)),
                jnp.sum((state.active & ~state.is_xyz).astype(jnp.int32)),
            ]).astype(rec.x_cam.dtype)
            return jnp.concatenate([rec.x_cam, rec.P_cam.reshape(-1),
                                    counters])

        self._summary_fn = jax.jit(_summary)
        self.state = self.runtime.make_initial_state()
        self.records: list[dict] = []
        self.frame_index = 0

        # per-phase runtime instrumentation (the reference's 7-phase
        # microsecond timing channel, EKF.cpp:255-618): each phase is
        # jitted separately and bracketed with block_until_ready
        self.phase_timing = phase_timing
        if phase_timing:
            rt = self.runtime
            self._phase_fns = {
                "Prediction": jax.jit(rt.phase_predict),
                "Matching": jax.jit(rt.phase_match),
                "Ransac": jax.jit(rt.phase_ransac),
                "UpdateLI": jax.jit(rt.phase_update_li),
                "RescueOutliers": jax.jit(rt.phase_rescue),
                "UpdateHI": jax.jit(rt.phase_update_hi),
                "MapManagement": jax.jit(rt.phase_mapman),
            }
            self._record_fn = jax.jit(rt.make_record)

        # optional keyframe pose-graph layer (graph/pose_graph.py): snapshot
        # the camera pose every ``keyframe_every`` frames; loop-closure
        # edges are added by the relocalization path via add_loop_closure()
        # automatic relocalization: after ``relocalize_after`` consecutive
        # frames with fewer than ``lost_matches_threshold`` matches, drop
        # the map, keep the pose, and re-bootstrap from the current frame
        # (the divergence-recovery path the reference wired but disabled,
        # EKF.cpp:587-588 / MapManagement.cpp:263-275).  0 disables.
        self.relocalize_after = relocalize_after
        self.lost_matches_threshold = lost_matches_threshold
        self.lost_streak = 0
        self.relocalizations = 0

        self.keyframe_every = keyframe_every
        self.pose_graph = None
        self._add_kf_fn = None
        self.loop_closer = None
        self.keyframe_frames: list[int] = []
        if keyframe_every > 0:
            from openekfmonoslam_tpu.graph import (add_keyframe,
                                                   make_pose_graph)
            from openekfmonoslam_tpu.graph.loop_closure import LoopCloser
            self.pose_graph = make_pose_graph(max_nodes=keyframe_capacity,
                                              max_edges=4 * keyframe_capacity)
            self._add_kf_fn = jax.jit(add_keyframe)
            # automatic loop closure: place recognition against stored
            # keyframe landmarks + PnP (graph/loop_closure.py)
            self.loop_closer = LoopCloser(self.runtime)

        self.output_path = output_path
        self._jsonl = None
        self._log = None
        self._sink = None
        self._debug_sink = None
        if output_path:
            os.makedirs(output_path, exist_ok=True)
            self._jsonl = open(os.path.join(output_path, "records.jsonl"),
                               "w")
            # human-readable per-step state dump (the reference's log.txt
            # channel, EKF.cpp:135-136 + State::showDetailed,
            # State.cpp:229-258)
            self._log = open(os.path.join(output_path, "log.txt"), "w")
            self._log.write(f"seed: {self.config.seed}\n")
            if render:
                from openekfmonoslam_tpu.viz.draw import VideoSink
                self._sink = VideoSink(output_path)
            if render_debug:
                from openekfmonoslam_tpu.viz.draw import VideoSink
                self._debug_sink = VideoSink(
                    os.path.join(output_path, "debug"),
                    video_name="ransacDebug.mp4")
        # 3D map debug channel (the reference's PCL viewer, Draw.h:88-100,
        # rendered headlessly): map3d_%05d.png every viz3d_every frames
        self._map3d = None
        if output_path and viz3d_every > 0:
            from openekfmonoslam_tpu.viz.viewer3d import Map3DSink
            self._map3d = Map3DSink(output_path, every=viz3d_every)

    # ------------------------------------------------------------------
    def init(self, image: np.ndarray) -> None:
        """EKF::init (EKF.cpp:170-237)."""
        gray = jnp.asarray(to_gray(np.asarray(image)))
        self.state = self._init_fn(self.state, gray)
        jax.block_until_ready(self.state.x)

    def _step_timed(self, gray) -> tuple:
        """Run the step as 7 separately-jitted phases, timing each
        (the EKF.cpp timer brackets).  Returns (record, phase_times_us)."""
        fns = self._phase_fns
        times = {}

        def bracket(name, fn, *args):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            times[name] = (time.perf_counter() - t0) * 1e6
            return out

        state = self.state
        state, pred = bracket("Prediction", fns["Prediction"], state)
        m, aux, in_ellipse = bracket("Matching", fns["Matching"],
                                     state, pred, gray)
        res = bracket("Ransac", fns["Ransac"], state, pred, m)
        state = bracket("UpdateLI", fns["UpdateLI"], state, pred, m,
                        res.inliers)
        pred2, rescued = bracket("RescueOutliers", fns["RescueOutliers"],
                                 state, m, res.outliers)
        state = bracket("UpdateHI", fns["UpdateHI"], state, pred2, m,
                        rescued)
        state, new_uv, new_ok, new_slot = bracket(
            "MapManagement", fns["MapManagement"],
            state, pred, m, res.inliers | rescued, aux, in_ellipse)
        self.state = state
        rec = self._record_fn(state, pred, m, res, rescued,
                              new_uv, new_ok, new_slot)
        return rec, times

    def step(self, image: np.ndarray) -> dict:
        """EKF::step (EKF.cpp:242-666); returns the per-frame record."""
        t0 = time.perf_counter()
        gray_np = to_gray(np.asarray(image))
        gray = jnp.asarray(gray_np)
        phase_times = None
        if self.phase_timing:
            rec, phase_times = self._step_timed(gray)
        else:
            self.state, rec = self._step_fn(self.state, gray)
        # no separate block_until_ready: the summary fetch below blocks
        # on the step, and each blocking round-trip costs full transfer
        # latency on a tunneled device
        self.frame_index += 1
        if (self.pose_graph is not None
                and self.frame_index % self.keyframe_every == 0):
            self._take_keyframe(gray_np)

        summary = np.asarray(self._summary_fn(self.state, rec),
                             np.float64)
        dt = time.perf_counter() - t0
        record = self._summary_to_dict(summary, dt)
        if phase_times is not None:
            record["phase_times_us"] = phase_times
            # live per-phase bracketing -- genuinely measured values
            # (the reference Timer semantics, EKF.cpp:255-618)
            record["phase_times_source"] = "measured"

        if self.relocalize_after > 0:
            if record["total_matches"] < self.lost_matches_threshold:
                self.lost_streak += 1
            else:
                self.lost_streak = 0
            if self.lost_streak >= self.relocalize_after:
                from openekfmonoslam_tpu.engine.checkpoint import reset_map
                fresh = self.runtime.make_initial_state()
                self.state = reset_map(self.state, fresh)
                self.state = self._init_fn(self.state, gray)
                jax.block_until_ready(self.state.x)
                self.lost_streak = 0
                self.relocalizations += 1
                record["relocalized"] = True
                if self.pose_graph is not None:
                    # immediate keyframe: the re-bootstrap scene is the
                    # place-recognition query for a loop-closure edge
                    self._take_keyframe(gray_np)

        self.records.append(record)
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
        if self._log:
            p, q = record["position"], record["orientation"]
            self._log.write(
                f"step {record['frame']}\n"
                f"  position: {p[0]:.9f} {p[1]:.9f} {p[2]:.9f}\n"
                f"  orientation: {q[0]:.9f} {q[1]:.9f} {q[2]:.9f} "
                f"{q[3]:.9f}\n"
                f"  matches {record['total_matches']} inliers "
                f"{record['li_inliers']}+{record['hi_inliers']} "
                f"map {record['n_active']}\n")
        if self._map3d is not None:
            # self.records already ends with this frame's record
            traj = np.asarray([r["position"] for r in self.records])
            self._map3d.maybe_write(self.frame_index, self.state, traj)
        if self._sink is not None:
            from openekfmonoslam_tpu.viz.draw import draw_prediction_overlay
            frame = draw_prediction_overlay(
                gray_np, np.asarray(rec.pred_uv), np.asarray(rec.pred_S),
                np.asarray(rec.visible), np.asarray(rec.z),
                np.asarray(rec.matched))
            self._sink.write(frame)
        if self._debug_sink is not None:
            from openekfmonoslam_tpu.viz.draw import draw_ransac_debug
            frame = draw_ransac_debug(
                gray_np, np.asarray(rec.z), np.asarray(rec.matched),
                np.asarray(rec.inliers), np.asarray(rec.new_uv),
                np.asarray(rec.new_ok))
            self._debug_sink.write(frame)
        return record

    def _take_keyframe(self, gray_np: np.ndarray) -> None:
        """Snapshot a keyframe into the pose graph, then attempt automatic
        loop closure against older keyframes (place recognition + PnP,
        graph/loop_closure.py)."""
        # odometry-edge information: the *relative* motion noise over the
        # keyframe interval (velocity random walk, k^3/2 growth) -- not the
        # inverse absolute covariance, which shrinks as the filter
        # converges and would drown loop-closure edges
        k = float(self.keyframe_every)
        sig_r = max(self.config.ekf.linear_accel_sd * k ** 1.5, 1e-5)
        sig_t = max(self.config.ekf.angular_accel_sd * k ** 1.5, 1e-5)
        info = jnp.asarray(np.diag(
            [1.0 / sig_r ** 2] * 3 + [1.0 / sig_t ** 2] * 3), jnp.float32)
        node_index = int(self.pose_graph.n_nodes)
        self.pose_graph = self._add_kf_fn(
            self.pose_graph, self.state.x[0:3], self.state.x[3:7], info)
        self.keyframe_frames.append(self.frame_index)

        kf = self.loop_closer.snapshot(self.state, node_index,
                                       self.frame_index)
        closure = self.loop_closer.try_close(gray_np, kf)
        if closure is not None:
            from openekfmonoslam_tpu.graph import add_loop_edge
            self.pose_graph = add_loop_edge(
                self.pose_graph, closure["i"], closure["j"],
                jnp.asarray(closure["dr"]), jnp.asarray(closure["dq"]),
                jnp.asarray(closure["info"], jnp.float32))
            if self._log:
                self._log.write(
                    f"loop closure: keyframe {closure['i']} <- "
                    f"{closure['j']} (frames {closure['frame_i']} <- "
                    f"{closure['frame_j']}), {closure['matches']} matches, "
                    f"rms {closure['rms_px']:.2f}px\n")

    def corrected_trajectory(self, iterations: int = 40) -> np.ndarray:
        """Optimize the pose graph and return the (T, 3) drift-corrected
        per-frame camera positions (raw positions transformed by each
        nearest preceding keyframe's graph correction)."""
        from openekfmonoslam_tpu.graph.loop_closure import correct_trajectory
        if self.pose_graph is None:
            raise RuntimeError("pose graph disabled (keyframe_every=0)")
        k = int(self.pose_graph.n_nodes)
        raw_r = np.asarray(self.pose_graph.node_r[:k], np.float64)
        raw_q = np.asarray(self.pose_graph.node_q[:k], np.float64)
        self.optimize_pose_graph(iterations)
        opt_r = np.asarray(self.pose_graph.node_r[:k], np.float64)
        opt_q = np.asarray(self.pose_graph.node_q[:k], np.float64)
        rec_r = np.asarray([r["position"] for r in self.records])
        rec_q = np.asarray([r["orientation"] for r in self.records])
        return correct_trajectory(rec_r, rec_q, self.keyframe_frames,
                                  raw_r, raw_q, opt_r, opt_q)

    # ------------------------------------------------------------------
    @property
    def state_vector(self) -> np.ndarray:
        return np.asarray(self.state.x)

    @property
    def covariance(self) -> np.ndarray:
        return np.asarray(self.state.P)

    @property
    def camera_position(self) -> np.ndarray:
        return np.asarray(self.state.x[0:3])

    def _summary_to_dict(self, s: np.ndarray, wall_s: float) -> dict:
        """The per-frame record dict from the ONE fetched summary vector
        (see __init__._summary for the layout)."""
        x = s[0:13]
        c = s[182:189]
        return {
            "frame": self.frame_index,
            "position": x[0:3].tolist(),
            "orientation": x[3:7].tolist(),
            "linear_velocity": x[7:10].tolist(),
            "angular_velocity": x[10:13].tolist(),
            "covariance_cam": s[13:182].reshape(13, 13).tolist(),
            "total_matches": int(c[0]),
            "li_inliers": int(c[1]),
            "hi_inliers": int(c[2]),
            "n_active": int(c[3]),
            "n_visible": int(c[4]),
            "n_xyz": int(c[5]),
            "n_inverse_depth": int(c[6]),
            "wall_time_s": wall_s,
        }

    def write_output_yml(self) -> Optional[str]:
        """Reference-shaped output.yml dump (EKF.cpp:614-629 layout incl.
        phase timings and the 13x13 covariance corner)."""
        if not self.output_path:
            return None
        from openekfmonoslam_tpu.eval.result_reader import write_output_yml
        path = os.path.join(self.output_path, "output.yml")
        return write_output_yml(self.records, path)

    def save_checkpoint(self, path: str) -> None:
        """Exact-resume checkpoint of the full filter carry."""
        from openekfmonoslam_tpu.engine.checkpoint import save_checkpoint
        save_checkpoint(path, self.state)
        if self.pose_graph is not None:
            from openekfmonoslam_tpu.engine.checkpoint import save_pose_graph
            save_pose_graph(path + ".graph.npz", self.pose_graph)

    def resume(self, path: str) -> None:
        """Restore a checkpoint (bit-exact continuation; the capability the
        reference left unimplemented, State.cpp:364-367)."""
        from openekfmonoslam_tpu.engine.checkpoint import load_checkpoint
        self.state = load_checkpoint(path, like=self.state)
        self.frame_index = int(self.state.frame)
        gpath = path + ".graph.npz"
        if self.pose_graph is not None and os.path.exists(gpath):
            from openekfmonoslam_tpu.engine.checkpoint import load_pose_graph
            self.pose_graph = load_pose_graph(gpath)

    def add_loop_closure(self, i: int, j: int, dr, dq,
                         info=None) -> None:
        """Add a loop-closure edge between keyframes i and j (called by the
        relocalization path when the camera re-observes keyframe j's
        scene)."""
        from openekfmonoslam_tpu.graph import add_loop_edge
        if self.pose_graph is None:
            raise RuntimeError("pose graph disabled (keyframe_every=0)")
        self.pose_graph = add_loop_edge(self.pose_graph, i, j,
                                        jnp.asarray(dr), jnp.asarray(dq),
                                        info)

    def optimize_pose_graph(self, iterations: int = 10):
        """Run Gauss-Newton over the keyframe graph; returns the optimized
        (K, 3) keyframe positions (drift-corrected trajectory anchor
        points)."""
        from openekfmonoslam_tpu.graph import optimize
        if self.pose_graph is None:
            raise RuntimeError("pose graph disabled (keyframe_every=0)")
        self.pose_graph = optimize(self.pose_graph, iterations)
        k = int(self.pose_graph.n_nodes)
        return np.asarray(self.pose_graph.node_r[:k])

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
            self._jsonl = None
        if self._log:
            self._log.close()
            self._log = None
        if self._sink is not None:
            self._sink.close()
            self._sink = None
        if self._debug_sink is not None:
            self._debug_sink.close()
            self._debug_sink = None
        self.write_output_yml()


def run_sequence(engine: SlamEngine, source, max_frames: Optional[int] = None,
                 progress_every: int = 0) -> list[dict]:
    """Drive an engine over a frame source (samples/EKF/main.cpp:123-167)."""
    it = iter(source)
    first = next(it)
    engine.init(first)
    for i, frame in enumerate(it):
        if max_frames is not None and i >= max_frames:
            break
        rec = engine.step(frame)
        if progress_every and (i + 1) % progress_every == 0:
            print(f"frame {rec['frame']}: matches={rec['total_matches']} "
                  f"inliers={rec['li_inliers']}+{rec['hi_inliers']} "
                  f"map={rec['n_active']} {rec['wall_time_s']*1e3:.1f} ms")
    return engine.records
