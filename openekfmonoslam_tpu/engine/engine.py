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
                 keyframe_every: int = 0, keyframe_capacity: int = 256,
                 relocalize_after: int = 0, lost_matches_threshold: int = 4,
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
        self.state = self.runtime.make_initial_state()
        self.records: list[dict] = []
        self.frame_index = 0

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
        if keyframe_every > 0:
            from openekfmonoslam_tpu.graph import (add_keyframe,
                                                   make_pose_graph)
            self.pose_graph = make_pose_graph(max_nodes=keyframe_capacity,
                                              max_edges=4 * keyframe_capacity)
            self._add_kf_fn = jax.jit(add_keyframe)

        self.output_path = output_path
        self._jsonl = None
        self._log = None
        self._sink = None
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

    # ------------------------------------------------------------------
    def init(self, image: np.ndarray) -> None:
        """EKF::init (EKF.cpp:170-237)."""
        gray = jnp.asarray(to_gray(np.asarray(image)))
        self.state = self._init_fn(self.state, gray)
        jax.block_until_ready(self.state.x)

    def step(self, image: np.ndarray) -> dict:
        """EKF::step (EKF.cpp:242-666); returns the per-frame record."""
        t0 = time.perf_counter()
        gray_np = to_gray(np.asarray(image))
        gray = jnp.asarray(gray_np)
        self.state, rec = self._step_fn(self.state, gray)
        jax.block_until_ready(self.state.x)
        dt = time.perf_counter() - t0

        self.frame_index += 1
        if (self.pose_graph is not None
                and self.frame_index % self.keyframe_every == 0):
            # information from the filter: inverse of the 6x6 pose
            # covariance (position block + small-angle orientation block)
            P = np.asarray(rec.P_cam, np.float64)
            pose_cov = np.zeros((6, 6))
            pose_cov[:3, :3] = P[0:3, 0:3]
            pose_cov[3:, 3:] = 4.0 * P[4:7, 4:7]   # dq_vec -> dtheta = 2 dq
            pose_cov += np.eye(6) * 1e-9
            info = jnp.asarray(np.linalg.inv(pose_cov), jnp.float32)
            self.pose_graph = self._add_kf_fn(
                self.pose_graph, self.state.x[0:3], self.state.x[3:7], info)

        record = self._record_to_dict(rec, dt)

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
        if self._sink is not None:
            from openekfmonoslam_tpu.viz.draw import draw_prediction_overlay
            frame = draw_prediction_overlay(
                gray_np, np.asarray(rec.pred_uv), np.asarray(rec.pred_S),
                np.asarray(rec.visible), np.asarray(rec.z),
                np.asarray(rec.matched))
            self._sink.write(frame)
        return record

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

    def _record_to_dict(self, rec: StepRecord, wall_s: float) -> dict:
        x = np.asarray(rec.x_cam, dtype=np.float64)
        return {
            "frame": self.frame_index,
            "position": x[0:3].tolist(),
            "orientation": x[3:7].tolist(),
            "linear_velocity": x[7:10].tolist(),
            "angular_velocity": x[10:13].tolist(),
            "covariance_cam": np.asarray(rec.P_cam,
                                         dtype=np.float64).tolist(),
            "total_matches": int(rec.total_matches),
            "li_inliers": int(rec.li_inliers),
            "hi_inliers": int(rec.hi_inliers),
            "n_active": int(rec.n_active),
            "n_visible": int(rec.n_visible),
            "wall_time_s": wall_s,
        }

    def write_output_yml(self) -> Optional[str]:
        """output.yml-compatible dump (EKF.cpp:614-629 layout)."""
        if not self.output_path:
            return None
        path = os.path.join(self.output_path, "output.yml")
        with open(path, "w") as f:
            f.write("%YAML:1.0\n")
            for r in self.records:
                f.write(f'"Frame {r["frame"]}":\n')
                f.write(f"  totalMatches: {r['total_matches']}\n")
                f.write(f"  liInliers: {r['li_inliers']}\n")
                f.write(f"  hiInliers: {r['hi_inliers']}\n")
                f.write("  StateEstimation:\n")
                f.write(f"    position: {r['position']}\n")
                f.write(f"    orientation: {r['orientation']}\n")
                f.write(f"    linearVelocity: {r['linear_velocity']}\n")
                f.write(f"    angularVelocity: {r['angular_velocity']}\n")
        return path

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
