"""Automatic loop closure: keyframe place recognition + PnP + graph edge.

The reference has no loop closure (its only divergence tool is the wired-
but-disabled map reset, EKF.cpp:587-588); drift is unbounded because
unseen landmarks are culled (EKF.cpp:582-586) so re-visiting a place gives
no constraint.  This module closes that gap on top of graph/pose_graph.py:

  * every keyframe snapshot stores the live landmarks' descriptors and
    world positions (frozen at snapshot time);
  * when a new keyframe is taken, its frame descriptors are matched
    (gate-free 2-NN + ratio test, the Matching.cpp:116-177 test without
    the ellipse gate) against every stored keyframe older than a gap;
  * with enough 2D-3D correspondences, the current camera pose is solved
    against the OLD keyframe's frozen landmarks by a masked Gauss-Newton
    PnP through the exact measurement model (core/camera.py projection +
    Newton re-distortion), initialized at the old keyframe's pose;
  * an accepted solve (reprojection RMS below threshold) becomes a
    loop-closure edge: the relative pose between the stored keyframe pose
    and the PnP pose is drift-free because both live in the old keyframe's
    world frame.

Everything numeric is jitted; the per-keyframe store is a small host-side
list (keyframes are sparse -- every Nth frame).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.core import camera as cam_mod
from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter.state import SlamState


def landmark_world_xyz(state: SlamState) -> jnp.ndarray:
    """(F, 3) world positions of all slots (inverse-depth ones through
    anchor + m/rho, changeInverseDepthToDepth, CommonFunctions.cpp:149-159)."""
    feats = state.features
    m = jax.vmap(quat.directional_vector)(feats[:, 3], feats[:, 4])
    rho = feats[:, 5]
    rho_safe = jnp.where(jnp.abs(rho) < 1e-12, 1e-12, rho)
    inv = feats[:, 0:3] + m / rho_safe[:, None]
    return jnp.where(state.is_xyz[:, None], feats[:, 0:3], inv)


class Keyframe(NamedTuple):
    """Host-side snapshot taken every keyframe interval."""

    node_index: int          # index in the pose graph
    frame_index: int         # engine frame number
    r: np.ndarray            # (3,) pose at snapshot
    q: np.ndarray            # (4,)
    lm_xyz: np.ndarray       # (F, 3) frozen landmark world positions
    lm_desc: np.ndarray      # (F, W) landmark descriptors
    lm_valid: np.ndarray     # (F,) bool


def match_2d3d(kf_desc: jnp.ndarray, kf_valid: jnp.ndarray,
               kp_desc: jnp.ndarray, kp_valid: jnp.ndarray,
               distance_fn, ratio: float = 0.8,
               max_distance: float = 60.0):
    """Gate-free 2-NN descriptor matching: stored landmarks x current
    keypoints.  Returns (matched (F,), kp_index (F,)).

    The 2-NN ratio test follows Matching.cpp:116-177; ``max_distance``
    additionally rejects weak absolute matches (no ellipse gate exists to
    prune impostors here, unlike the guided matcher).
    """
    dist = distance_fn(kf_desc, kp_desc).astype(jnp.float32)   # (F, K)
    BIG = jnp.float32(1e30)
    dist = jnp.where(kp_valid[None, :], dist, BIG)
    neg_top2, idx_top2 = jax.lax.top_k(-dist, 2)
    d1, d2 = -neg_top2[:, 0], -neg_top2[:, 1]
    matched = (kf_valid & (d1 <= max_distance)
               & (d1 <= d2 * ratio))
    return matched, idx_top2[:, 0]


def pnp_gauss_newton(camera: Camera, xyz: jnp.ndarray, uv: jnp.ndarray,
                     valid: jnp.ndarray, r0: jnp.ndarray, q0: jnp.ndarray,
                     iterations: int = 15, damping: float = 1e-6,
                     trim_px: float = 3.0):
    """Masked GN PnP: camera pose from 2D-3D matches through the exact
    projection + re-distortion model.  Returns (r, q, rms_px, n_used, H).

    Robust to wrong 2-NN correspondences (gate-free descriptor matching
    inevitably admits impostors): after a first solve over all matches,
    matches whose reprojection error exceeds ``trim_px`` are dropped and
    the pose is re-solved on the survivors; rms/n_used/H describe the
    trimmed set."""
    dtype = xyz.dtype
    uv = uv.astype(dtype)

    def project_all(r, q):
        Rt = quat.to_rotation_matrix(q).T

        def one(X):
            p = Rt @ (X - r)
            z_safe = jnp.where(jnp.abs(p[2]) < 1e-6, 1.0, p[2])
            return cam_mod.distort(camera,
                                   cam_mod.project(camera,
                                                   p.at[2].set(z_safe)))
        return jax.vmap(one)(xyz)

    def make_residual(w):
        def residual(delta, r, q):
            dr, dth = delta[0:3], delta[3:6]
            dq = jnp.concatenate([jnp.ones((1,), dtype), 0.5 * dth])
            q2 = quat.multiply(q, dq)
            q2 = q2 / jnp.linalg.norm(q2)
            res = (project_all(r + dr, q2) - uv) * w[:, None]
            return res.reshape(-1)
        return residual

    def solve(w, r, q):
        residual = make_residual(w)

        def gn(i, carry):
            r, q = carry
            zero6 = jnp.zeros((6,), dtype)
            res = residual(zero6, r, q)
            J = jax.jacfwd(residual)(zero6, r, q)      # (2M, 6)
            H = J.T @ J + damping * jnp.eye(6, dtype=dtype)
            g = J.T @ res
            delta = -jnp.linalg.solve(H, g)
            dq = jnp.concatenate([jnp.ones((1,), dtype),
                                  0.5 * delta[3:6]])
            q_new = quat.multiply(q, dq)
            q_new = q_new / jnp.linalg.norm(q_new)
            return r + delta[0:3], q_new

        return jax.lax.fori_loop(0, iterations, gn, (r, q))

    w0 = valid.astype(dtype)
    r, q = solve(w0, r0.astype(dtype), q0.astype(dtype))

    # trim: drop correspondences whose first-pass reprojection error
    # exceeds trim_px, then re-solve on the survivors
    err = jnp.linalg.norm(project_all(r, q) - uv, axis=-1)
    inlier = valid & (err <= trim_px)
    w = inlier.astype(dtype)
    n_used = jnp.sum(inlier.astype(jnp.int32))
    r, q = solve(w, r, q)

    res = (project_all(r, q) - uv) * w[:, None]
    rms = jnp.sqrt(jnp.sum(res * res)
                   / jnp.maximum(2.0 * n_used.astype(dtype), 1.0))
    # pose information at the solution (unit pixel noise): J^T J over the
    # local (dr, dtheta) parametrization -- the loop edge's weight
    J = jax.jacfwd(make_residual(w))(jnp.zeros((6,), dtype), r, q)
    H = J.T @ J
    return r, q, rms, n_used, H


class LoopCloser:
    """Host-side driver: stores keyframe snapshots, detects loop closures
    when new keyframes arrive, returns accepted edges."""

    def __init__(self, runtime, min_gap: int = 5, min_matches: int = 10,
                 max_rms_px: float = 2.0, ratio: float = 0.8,
                 max_distance: float = 60.0):
        self.runtime = runtime
        self.min_gap = min_gap
        self.min_matches = min_matches
        self.max_rms_px = max_rms_px
        self.ratio = ratio
        self.max_distance = max_distance
        self.keyframes: list[Keyframe] = []
        self.closures: list[dict] = []
        self._match_fn = jax.jit(
            lambda kd, kv, pd, pv: match_2d3d(
                kd, kv, pd, pv, runtime.frontend.distance,
                ratio, max_distance))
        self._pnp_fn = jax.jit(pnp_gauss_newton)
        self._sig_fn = jax.jit(self._signature)
        self._xyz_fn = jax.jit(landmark_world_xyz)

    def _signature(self, gray):
        """Current frame's (kp_xy, desc, valid) -- detector + descriptors
        over the full frame (border-masked)."""
        from openekfmonoslam_tpu.vision import fast
        rt = self.runtime
        aux = rt.frontend.precompute(gray)
        kps = fast.detect_keypoints(aux["score_nms"],
                                    rt._border_mask(gray.shape),
                                    rt.config.max_keypoints)
        desc = rt.frontend.describe(aux, kps.yx)
        kp_xy = jnp.stack([kps.yx[:, 1], kps.yx[:, 0]],
                          axis=-1).astype(rt.dtype)
        return kp_xy, desc, kps.valid

    def snapshot(self, state: SlamState, node_index: int,
                 frame_index: int) -> Keyframe:
        kf = Keyframe(
            node_index=node_index,
            frame_index=frame_index,
            r=np.asarray(state.x[0:3], np.float64),
            q=np.asarray(state.x[3:7], np.float64),
            lm_xyz=np.asarray(self._xyz_fn(state)),
            lm_desc=np.asarray(state.descriptors),
            lm_valid=np.asarray(state.active
                                & (state.times_matched >= 2)),
        )
        self.keyframes.append(kf)
        return kf

    def try_close(self, gray, new_kf: Keyframe) -> Optional[dict]:
        """Match ``new_kf``'s frame against all stored keyframes older
        than ``min_gap``; return an accepted loop-closure edge dict or
        None."""
        candidates = [kf for kf in self.keyframes
                      if new_kf.node_index - kf.node_index > self.min_gap]
        if not candidates:
            return None
        kp_xy, kp_desc, kp_valid = self._sig_fn(jnp.asarray(gray))

        best = None
        for kf in candidates:
            matched, kp_idx = self._match_fn(
                jnp.asarray(kf.lm_desc), jnp.asarray(kf.lm_valid),
                kp_desc, kp_valid)
            n = int(jnp.sum(matched.astype(jnp.int32)))
            if n < self.min_matches:
                continue
            if best is None or n > best[0]:
                best = (n, kf, np.asarray(matched), np.asarray(kp_idx))
        if best is None:
            return None

        n, kf, matched, kp_idx = best
        uv = np.asarray(kp_xy)[kp_idx]
        r, q, rms, n_used, H = self._pnp_fn(
            self.runtime.camera, jnp.asarray(kf.lm_xyz, self.runtime.dtype),
            jnp.asarray(uv, self.runtime.dtype), jnp.asarray(matched),
            jnp.asarray(kf.r, self.runtime.dtype),
            jnp.asarray(kf.q, self.runtime.dtype))
        rms = float(rms)
        if rms > self.max_rms_px or int(n_used) < self.min_matches:
            return None
        r = np.asarray(r, np.float64)
        q = np.asarray(q, np.float64)
        # drift-free relative pose: both kf.(r, q) and the PnP pose live in
        # the old keyframe's world frame (the frozen landmarks define it)
        from openekfmonoslam_tpu.graph.pose_graph import relative_pose
        dr, dq = relative_pose(jnp.asarray(kf.r), jnp.asarray(kf.q),
                               jnp.asarray(r), jnp.asarray(q))
        closure = {
            "i": kf.node_index, "j": new_kf.node_index,
            "dr": np.asarray(dr), "dq": np.asarray(dq),
            "info": np.asarray(H, np.float64),
            "matches": n, "rms_px": rms,
            "frame_i": kf.frame_index, "frame_j": new_kf.frame_index,
        }
        self.closures.append(closure)
        return closure


def correct_trajectory(records_r: np.ndarray, records_q: np.ndarray,
                       kf_frames: list, raw_kf_r: np.ndarray,
                       raw_kf_q: np.ndarray, opt_kf_r: np.ndarray,
                       opt_kf_q: np.ndarray) -> np.ndarray:
    """Apply per-keyframe graph corrections to the full per-frame
    trajectory: each frame takes the SE(3) correction of the nearest
    preceding keyframe, T_corr = T_opt T_raw^-1 (world-frame left
    multiplication)."""
    out = np.asarray(records_r, np.float64).copy()
    if not kf_frames:
        return out
    kf_frames = np.asarray(kf_frames)
    for t in range(out.shape[0]):
        frame = t + 1
        k = int(np.searchsorted(kf_frames, frame, side="right")) - 1
        if k < 0:
            continue
        R_raw = np.asarray(quat.to_rotation_matrix(
            jnp.asarray(raw_kf_q[k])))
        R_opt = np.asarray(quat.to_rotation_matrix(
            jnp.asarray(opt_kf_q[k])))
        R_corr = R_opt @ R_raw.T
        t_corr = opt_kf_r[k] - R_corr @ raw_kf_r[k]
        out[t] = R_corr @ out[t] + t_corr
    return out
