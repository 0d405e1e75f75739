"""Batched 1-point RANSAC and high-innovation outlier rescue.

Reference: 1PointRansac.cpp + rescueOutliers (EKF.cpp:68-119).  For each
hypothesis the reference deep-copies the state, applies a *state-only*
Kalman update from a single match (Update.cpp:269-275), re-predicts every
feature, and counts matches whose prediction moved to within a pixel
threshold (1PointRansac.cpp:48-84).  Hypothesis selection is deterministic
(match i for hypothesis i, :88-92) with an adaptively shrinking visit count
(:171-177).

TPU-first departure: every hypothesis is evaluated in parallel --
the state-only 1-point updates share P, so all hypothesized states come
from one batched (F, N, 2) x (F, 2) contraction, and re-prediction is a
vmap over (hypotheses x slots).  The reference's sequential adaptive
early-exit changes only *which* hypotheses are eligible to win, so it is
replayed exactly as a tiny O(F) scan over the precomputed support counts.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.core import camera as cam_mod
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter.measure import Prediction, measure_one, point_in_camera_frame
from openekfmonoslam_tpu.filter.state import CAM_DIM, FEAT_DIM, SlamState


def _solve2x2(S: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 2x2 solve: (..., 2, 2) x (..., 2) -> (..., 2).

    jnp.linalg.solve lowers tiny batched systems to an LU pipeline that is
    far slower on TPU than four VPU multiplies.
    """
    a, c = S[..., 0, 0], S[..., 0, 1]
    d, e = S[..., 1, 0], S[..., 1, 1]
    det = a * e - c * d
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    x0 = (e * b[..., 0] - c * b[..., 1]) / det
    x1 = (a * b[..., 1] - d * b[..., 0]) / det
    return jnp.stack([x0, x1], axis=-1)


class RansacResult(NamedTuple):
    inliers: jnp.ndarray       # (F,) bool: low-innovation inlier set
    outliers: jnp.ndarray     # (F,) bool: matched but not inlier
    best_support: jnp.ndarray  # () int32
    hypotheses_visited: jnp.ndarray  # () int32 (diagnostic)


def _batched_state_only_updates(state: SlamState, pred: Prediction,
                                z: jnp.ndarray, matched: jnp.ndarray,
                                pixel_error: float,
                                deadband: bool = False) -> jnp.ndarray:
    """Hypothesized states: one state-only 1-point update per matched slot.

    Returns (F, 13) camera states (feature updates also happen in the
    reference's updateOnlyState, but only the camera part affects the
    support re-prediction of *other* features; the hypothesis feature's own
    update has negligible effect and is included for exactness).

    Actually returns the full (F, N) updated state vectors.
    """
    P = state.P
    dtype = P.dtype
    F = pred.uv.shape[0]

    # P H_i^T = (H_i P)^T: P is symmetric, so the rows of the shared H P
    # assembled once in measure.predict_measurements (hp_products) serve
    # every hypothesis -- no per-call (F, N, 2) re-assembly.
    HPr = pred.HP.reshape(F, 2, -1)                      # (F, 2, N)

    # S_i with the update-path R = pixelError * I (determineKalmanGain,
    # Update.cpp:95-97); pred.S carries R = I, so adjust the diagonal.
    S = pred.S + (pixel_error - 1.0) * jnp.eye(2, dtype=dtype)[None]

    dz = (z - pred.uv)                                   # (F, 2)
    if deadband:
        # updateOnlyState runs through the same deadbanded stateUpdate as
        # the joint update (Update.cpp:133-203) -- filter/update.py DELTA
        from openekfmonoslam_tpu.filter.update import DELTA
        dz = jnp.where(jnp.abs(dz) > DELTA, dz, 0.0)
    # K_i dz_i = (H_i P)^T S_i^-1 dz_i
    sol = _solve2x2(S, dz)                               # (F, 2)
    dx = jnp.einsum("fin,fi->fn", HPr, sol)              # (F, N)
    if deadband:
        from openekfmonoslam_tpu.filter.update import DELTA
        dx = jnp.where(jnp.abs(dx) > DELTA, dx, 0.0)
    dx = dx * matched[:, None].astype(dtype)
    return state.x[None, :] + dx


def _support_counts(states_x: jnp.ndarray, state: SlamState, camera: Camera,
                    z: jnp.ndarray, matched: jnp.ndarray,
                    threshold: float) -> jnp.ndarray:
    """(F,) support of each hypothesis: matched features re-predicted within
    ``threshold`` pixels (matchesBelowAThreshold, 1PointRansac.cpp:48-84)."""

    F_slots = state.n_features

    def one_hypothesis(xh):
        cam7 = xh[:7]
        feats = xh[CAM_DIM:CAM_DIM + F_slots * FEAT_DIM].reshape(
            -1, FEAT_DIM)

        def one_slot(f, xyz):
            uv = measure_one(camera, cam7, f, xyz)
            p_cam = point_in_camera_frame(cam7, f, xyz)
            vis = (cam_mod.in_front_and_in_fov(camera, p_cam)
                   & cam_mod.in_image(camera, uv))
            return uv, vis

        uv, vis = jax.vmap(one_slot)(feats, state.is_xyz)
        dist = jnp.linalg.norm(z - uv, axis=-1)
        good = matched & state.active & vis & (dist < threshold)
        return jnp.sum(good.astype(jnp.int32)), good

    return jax.vmap(one_hypothesis)(states_x)


def _adaptive_visit_scan(support: jnp.ndarray, matched: jnp.ndarray,
                         all_inliers_probability: float,
                         max_hypotheses: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Replay the reference's sequential hypothesis loop over precomputed
    support counts (1PointRansac.cpp:125-186).

    Hypothesis i is visited while i < current numberOfHipotesis; a visited
    hypothesis with strictly greater support becomes the leader and shrinks
    numberOfHipotesis to log(1-p)/log(e) with e the leader's outlier ratio.
    Returns (best_index, best_support, visited_count).
    """
    n_matches = jnp.sum(matched.astype(jnp.int32))
    # the C++ computes the bound in double (1PointRansac.cpp:171-177);
    # follow the run's x64 setting so f64 parity runs match it exactly
    fdt = jnp.result_type(0.0)
    log1mp = jnp.log(jnp.asarray(1.0 - all_inliers_probability, fdt))
    # Hypothesis k of the reference is the k-th *match* in slot order; the
    # visit bound i < numberOfHipotesis applies to that match rank.
    rank = jnp.cumsum(matched.astype(jnp.int32)) - 1

    def body(carry, i):
        best_i, best_s, num_hyp, visited = carry
        visit = (rank[i] < num_hyp) & matched[i]
        s = support[i].astype(jnp.int32)
        better = visit & (s > best_s)
        e = 1.0 - s.astype(fdt) / jnp.maximum(n_matches, 1)
        # floor() cast as in the C++ static_cast<int>; clamp against e ~ 0/1
        new_num = jnp.where(
            e <= 0.0, jnp.int32(0),
            jnp.where(e >= 1.0, jnp.int32(max_hypotheses),
                      (log1mp / jnp.log(jnp.maximum(e, 1e-30))).astype(jnp.int32)))
        carry = (
            jnp.where(better, i, best_i),
            jnp.where(better, s, best_s),
            jnp.where(better, new_num, num_hyp),
            visited + visit.astype(jnp.int32),
        )
        return carry, None

    F = support.shape[0]
    init = (jnp.int32(0), jnp.int32(0), jnp.int32(max_hypotheses),
            jnp.int32(0))
    (best_i, best_s, _, visited), _ = jax.lax.scan(
        body, init, jnp.arange(F, dtype=jnp.int32))
    return best_i, best_s, visited


def ransac(state: SlamState, pred: Prediction, z: jnp.ndarray,
           matched: jnp.ndarray, camera: Camera, threshold: float,
           all_inliers_probability: float, pixel_error: float,
           max_hypotheses: int = 1000,
           parity_visit: bool = False,
           visit_key: jnp.ndarray | None = None,
           deadband: bool = False) -> RansacResult:
    """1-point RANSAC over all matched slots (ransac, 1PointRansac.cpp:101-234).

    ``parity_visit`` replays the reference's sequential adaptive visit
    bound (a 96-step scalar lax.scan kept for bit-parity runs); the
    default evaluates every hypothesis and takes the argmax -- same or
    better winner (the adaptive bound can only *skip* hypotheses), no
    sequential dependency.  Ties break to the lowest index in both modes,
    matching the reference's strict ``>`` comparison.

    ``visit_key`` (reference_quirks mode) visits hypotheses sorted by the
    given per-slot key -- pass ``state.birth`` to replay the reference's
    mapFeatures insertion order (selectRandomMatch takes match i in list
    order, 1PointRansac.cpp:88-92); None keeps TPU slot order.
    ``deadband`` applies the reference's DELTA deadband inside the
    1-point state-only updates (Update.cpp:133-203).
    """
    states_x = _batched_state_only_updates(state, pred, z, matched,
                                           pixel_error, deadband=deadband)
    support, good = _support_counts(states_x, state, camera, z, matched,
                                    threshold)
    if visit_key is not None:
        # visit permutation: matched slots in key order first (stable);
        # unmatched slots sink to the end and are mask-skipped anyway
        big = jnp.iinfo(jnp.int32).max
        perm = jnp.argsort(jnp.where(matched, visit_key, big),
                           stable=True).astype(jnp.int32)
    else:
        perm = None
    if parity_visit:
        if perm is not None:
            best_p, best_s, visited = _adaptive_visit_scan(
                support[perm], matched[perm], all_inliers_probability,
                max_hypotheses)
            best_i = perm[best_p]
        else:
            best_i, best_s, visited = _adaptive_visit_scan(
                support, matched, all_inliers_probability, max_hypotheses)
    else:
        if perm is not None:
            ms = jnp.where(matched[perm], support[perm], -1)
            best_p = jnp.argmax(ms).astype(jnp.int32)
            best_s = jnp.maximum(ms[best_p], 0)
            best_i = perm[best_p]
        else:
            masked_support = jnp.where(matched, support, -1)
            best_i = jnp.argmax(masked_support).astype(jnp.int32)
            best_s = jnp.maximum(masked_support[best_i], 0)
        visited = jnp.sum(matched.astype(jnp.int32))

    # The winning hypothesis's support set is the low-innovation inlier set;
    # with no winning hypothesis (best support 0) it is empty.
    inliers = good[best_i] & matched & (best_s > 0)
    outliers = matched & ~inliers
    return RansacResult(inliers=inliers, outliers=outliers,
                        best_support=best_s, hypotheses_visited=visited)


def rescue_outliers(pred_new: Prediction, z: jnp.ndarray,
                    outliers: jnp.ndarray, chi2_threshold: float
                    ) -> jnp.ndarray:
    """High-innovation rescue (rescueOutliers, EKF.cpp:68-119).

    After the low-innovation update, outlier matches whose re-predicted
    innovation passes d^T S^-1 d < chi2_threshold are rescued.  ``pred_new``
    must come from the post-update state/covariance.
    """
    d = z - pred_new.uv                                  # (F, 2)
    md = jnp.sum(d * _solve2x2(pred_new.S, d), axis=-1)  # d^T S^-1 d
    return outliers & pred_new.visible & (md < chi2_threshold)
