"""Map management: counters, culling, and inverse-depth -> XYZ conversion.

Reference: MapManagement.cpp + the orchestration at EKF.cpp:572-612.
Per frame: update predicted/matched counters and refresh inlier descriptors
(:74-113); remove features whose inlier ratio dropped below
GoodFeatureMatchingPercent (:279-307); remove currently-unseen features
under map-size pressure (EKF.cpp:582-586); convert at most one
inverse-depth feature to XYZ when its linearity index falls below threshold
(:311-523).

TPU-first departures: removal is a masked zeroing of P rows/columns and a
cleared active bit (no compaction/re-basing, MapManagement.cpp:168-259);
conversion collapses one slot's 6-dim block to a 3-dim block through
filter/shardable.py placement forms (one-hot row selection + predicate
writes -- sharding-clean and branch-gated on the rare trigger) and
retires the last 3 dims.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.filter import shardable
from openekfmonoslam_tpu.filter.state import (
    CAM_DIM,
    FEAT_DIM,
    SlamState,
    dim_active_mask,
    zero_inactive,
)


def update_counters(state: SlamState, predicted: jnp.ndarray,
                    inlier: jnp.ndarray, inlier_desc: jnp.ndarray,
                    refreshed: jnp.ndarray | None = None) -> SlamState:
    """Counters + descriptor refresh (updateMapFeatures, MapManagement.cpp:74-113).

    ``refreshed`` marks slots whose ``inlier_desc`` holds a NEW template
    this frame (Matches.refreshed); their capture pose anchor
    (state.patch_pose, the NCC warp reference) moves to the current
    camera.  None keeps the stored poses (injected-replay path)."""
    new = state._replace(
        times_predicted=state.times_predicted + predicted.astype(jnp.int32),
        times_matched=state.times_matched + inlier.astype(jnp.int32),
        descriptors=jnp.where(inlier[:, None], inlier_desc,
                              state.descriptors),
    )
    if refreshed is not None:
        take = (inlier & refreshed)[:, None]
        pose_now = jnp.broadcast_to(state.x[:7].astype(jnp.float32),
                                    state.patch_pose.shape)
        new = new._replace(
            patch_pose=jnp.where(take, pose_now, state.patch_pose))
    return new


def remove_features(state: SlamState, remove: jnp.ndarray) -> SlamState:
    """Deactivate slots: zero their P rows/cols and state dims.

    Equal to the reference's row/column deletion (MapManagement.cpp:168-259)
    under the masked-P invariant -- remaining blocks are untouched.
    """
    new_active = state.active & ~remove
    st = state._replace(active=new_active)
    dim_mask = dim_active_mask(st)
    return st._replace(
        x=st.x.at[CAM_DIM:].set(
            jnp.where(dim_mask[CAM_DIM:], st.x[CAM_DIM:], 0.0)),
        P=zero_inactive(st.P, dim_mask),
        is_xyz=st.is_xyz & new_active,
    )


def bad_feature_mask(state: SlamState, good_percent: float) -> jnp.ndarray:
    """Features whose inlier ratio fell below threshold
    (removeBadMapFeatures, MapManagement.cpp:279-307).  Never-predicted
    features are kept (the reference's 0/0 NaN compares false)."""
    predicted = state.times_predicted
    ratio = state.times_matched.astype(jnp.float32) / jnp.maximum(predicted, 1)
    return state.active & (predicted > 0) & (ratio < good_percent)


def linearity_index(state: SlamState) -> jnp.ndarray:
    """Civera linearity index per slot (computeLinearityIndex,
    MapManagement.cpp:311-339).

    L = 4 * (sigma_rho / rho^2) * cos(alpha) / d_cam, with alpha the
    parallax angle between the rays camera->point and anchor->point.
    Returns +inf for slots that are inactive or already XYZ.
    """
    F = state.n_features
    feats = state.features                                   # (F, 6)
    rho = feats[:, 5]
    rho_dim = CAM_DIM + FEAT_DIM * jnp.arange(F) + 5
    sigma_rho = jnp.sqrt(jnp.abs(state.P[rho_dim, rho_dim]))
    rho_safe = jnp.where(jnp.abs(rho) < 1e-12, 1e-12, rho)
    sigma_d = sigma_rho / (rho_safe * rho_safe)

    m = jax.vmap(quat.directional_vector)(feats[:, 3], feats[:, 4])  # (F, 3)
    xyz = feats[:, 0:3] + m / rho_safe[:, None]              # (F, 3)
    to_cam = xyz - state.r[None, :]
    to_anchor = xyz - feats[:, 0:3]
    d_cam = jnp.linalg.norm(to_cam, axis=-1)
    d_anchor = jnp.linalg.norm(to_anchor, axis=-1)
    denom = jnp.maximum(d_cam * d_anchor, 1e-20)
    cos_alpha = jnp.sum(to_cam * to_anchor, axis=-1) / denom
    li = 4.0 * sigma_d * cos_alpha / jnp.maximum(d_cam, 1e-20)
    eligible = state.active & ~state.is_xyz
    return jnp.where(eligible, li, jnp.inf)


def convert_one_to_xyz(state: SlamState, threshold: float,
                       enable=True,
                       order_key: jnp.ndarray | None = None) -> SlamState:
    """Convert the first eligible slot with linearity index below threshold
    (convertMapFeaturesInverseDepthToDepth, MapManagement.cpp:494-523: at
    most one conversion per frame).

    The 6-dim inverse-depth block collapses to 3 XYZ dims through the 3x6
    Jacobian J = [I | dm/dtheta / rho | dm/dphi / rho | -m / rho^2]
    (convertToDepth, MapManagement.cpp:343-385); the slot's last 3 dims are
    retired (zero P rows/cols).

    ``enable`` gates the conversion (the map-management frequency gate);
    the cheap eligibility scan always runs, the P surgery is branched on
    the (rare) trigger below.
    """
    do, slot = conversion_candidate(state, threshold, order_key)
    do = do & jnp.asarray(enable)
    # conversions are rare (<=1 slot, only when the linearity index dips):
    # branch the P/x surgery on ``do`` so non-converting frames skip the
    # ~5 full-P traffic passes below (the cheap eligibility scan above
    # runs every frame)
    return jax.lax.cond(
        do, lambda st: _convert_slot(st, slot), lambda st: st, state)


def conversion_candidate(state: SlamState, threshold: float,
                         order_key: jnp.ndarray | None = None
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(eligible, slot): the cheap eligibility scan, exposed so batched
    runners can gate the expensive P surgery at batch level
    (parallel/batch_runner.batched_step)."""
    li = linearity_index(state)
    below = li < threshold
    if order_key is None:
        slot = jnp.argmax(below)                   # first True in slot order
    else:
        # reference_quirks mode: the reference scans
        # mapFeaturesInvDepth in INSERTION order (MapManagement.cpp:
        # 494-523) -- pass state.birth to pick the oldest eligible slot
        big = jnp.iinfo(jnp.int32).max
        slot = jnp.argmin(jnp.where(below, order_key, big))
    return jnp.any(below), slot


def _convert_slot(state: SlamState, slot: jnp.ndarray,
                  enable=True) -> SlamState:

    dtype = state.P.dtype
    feats = state.features
    f = feats[slot]
    theta, phi, rho = f[3], f[4], f[5]
    rho_safe = jnp.where(jnp.abs(rho) < 1e-12, 1e-12, rho)
    m = quat.directional_vector(theta, phi)
    xyz = f[0:3] + m / rho_safe

    cp, sp = jnp.cos(phi), jnp.sin(phi)
    ct, st_ = jnp.cos(theta), jnp.sin(theta)
    dm_dtheta = jnp.stack([cp * ct, jnp.zeros_like(cp), -cp * st_])
    dm_dphi = jnp.stack([-sp * st_, -cp, -sp * ct])
    J = jnp.concatenate([
        jnp.eye(3, dtype=dtype),
        (dm_dtheta / rho_safe)[:, None],
        (dm_dphi / rho_safe)[:, None],
        (-m / (rho_safe * rho_safe))[:, None],
    ], axis=1)                                      # (3, 6)

    # The slot's rows/cols/block are extracted and re-placed through
    # filter.shardable: a one-hot psum for the row strip and predicate
    # selects for the writes, never a dynamic slice along P's (possibly
    # row-sharded) leading dim -- bit-exact, zero full-P communication.
    # Rare-path work: barrier P so XLA's latency scheduler cannot hoist
    # the (N, N) strip extraction + full-P VMEM copies out of the
    # conversion cond into every steady-state frame (same fix as
    # features._add_features_impl, measured on the round-5 trace).
    P = jax.lax.optimization_barrier(state.P)
    N = P.shape[0]
    off = (CAM_DIM + FEAT_DIM * slot).astype(jnp.int32)
    rows6 = shardable.select_rows(P, off, FEAT_DIM)        # (6, N)
    ocols = (jnp.arange(N)[:, None]
             == (off + jnp.arange(FEAT_DIM))[None, :]).astype(dtype)
    cols6 = P @ ocols                                      # (N, 6) local
    P66 = jax.lax.dynamic_slice(rows6, (jnp.int32(0), off),
                                (FEAT_DIM, FEAT_DIM))

    new_rows = jnp.zeros((FEAT_DIM, N), dtype=dtype).at[0:3].set(J @ rows6)
    new_cols = jnp.concatenate(
        [cols6 @ J.T, jnp.zeros((N, FEAT_DIM - 3), dtype=dtype)], axis=1)
    new_block = jnp.zeros((FEAT_DIM, FEAT_DIM), dtype=dtype).at[0:3, 0:3].set(
        J @ P66 @ J.T)

    P_new = shardable.place_rows(P, new_rows, off)
    P_new = shardable.place_cols(P_new, new_cols, off)
    P_new = shardable.place_block(P_new, new_block, off, off)

    feat_new = jnp.concatenate([xyz, jnp.zeros((3,), dtype=dtype)])
    x_new = jax.lax.dynamic_update_slice(state.x, feat_new, (off,))

    if enable is not True:
        # masked variant (vmapped batch path, where per-stream lax.cond
        # would execute both branches anyway): where(False, new, old)
        # is bit-exact pass-through
        en = jnp.asarray(enable)
        P_new = jnp.where(en, P_new, P)
        x_new = jnp.where(en, x_new, state.x)
        is_xyz = jnp.where(en, state.is_xyz.at[slot].set(True),
                           state.is_xyz)
        return state._replace(x=x_new, P=P_new, is_xyz=is_xyz)

    return state._replace(
        x=x_new,
        P=P_new,
        is_xyz=state.is_xyz.at[slot].set(True),
    )


def map_pressure(state: SlamState, needed: jnp.ndarray,
                 always_remove_unseen: bool, max_map_features: int,
                 max_map_size: int) -> jnp.ndarray:
    """Unseen-removal trigger (EKF.cpp:582-584)."""
    live_dims = jnp.sum(dim_active_mask(state).astype(jnp.int32))
    n_feat = jnp.sum(state.active.astype(jnp.int32))
    cond = jnp.asarray(always_remove_unseen)
    if max_map_features > 0:
        cond = cond | (n_feat + needed > max_map_features)
    if max_map_size > 0:
        cond = cond | (live_dims + needed * 6 > max_map_size)
    return (needed > 0) & cond
