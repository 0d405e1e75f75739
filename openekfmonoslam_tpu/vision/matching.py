"""Active-search guided matching with analytic ellipse gating.

Reference: Matching.cpp.  The reference rasterizes each prediction's
uncertainty ellipse into a detection mask (drawUncertaintyEllipse2D,
Draw.cpp:42-64), detects keypoints only inside, then per prediction gates
keypoints by ellipse membership (pointIsInsideEllipse, EKFMath.cpp:302-351)
and does a 2-NN Hamming match with a ratio test (:116-177).

The rasterized ellipse has half-axes 2*sqrt(eig * CHISQ_95_2)
(EKFMath.cpp:292-293), i.e. the 95% ellipse scaled 2x linearly; the
analytic equivalent used here is the Mahalanobis gate
d^T S^-1 d <= gate_scale^2 * chi2_95(2) with gate_scale = 2.

TPU-first: the per-pixel "inside any ellipse" mask and the (F, K) gated
distance matrix are dense vectorized ops; no rasterization, no loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.vision import brief


class Matches(NamedTuple):
    z: jnp.ndarray          # (F, 2) matched pixel (x, y); 0 where unmatched
    matched: jnp.ndarray    # (F,) bool
    desc: jnp.ndarray       # (F, W) matched keypoint descriptor
    distance: jnp.ndarray   # (F,) int32 Hamming distance (diagnostic)
    refreshed: jnp.ndarray  # (F,) bool: desc holds a NEW template this
    #                         frame (drives the patch_pose warp anchor)


def _inv_2x2(S: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 2x2 inverse (cheaper than linalg.inv on TPU)."""
    a, b = S[..., 0, 0], S[..., 0, 1]
    c, d = S[..., 1, 0], S[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    inv = jnp.stack([
        jnp.stack([d, -b], axis=-1),
        jnp.stack([-c, a], axis=-1),
    ], axis=-2)
    return inv / det[..., None, None]


def ellipse_union_mask(shape: tuple, centers: jnp.ndarray,
                       S: jnp.ndarray, visible: jnp.ndarray,
                       gate: float, block: int = 4) -> jnp.ndarray:
    """(H, W) bool: pixels inside any visible prediction's gate ellipse.

    Replaces the rasterized detection mask (Matching.cpp:193-202).

    This mask only *routes the detection budget* -- the exact per-keypoint
    Mahalanobis gate is re-applied in match_predictions -- so it is
    evaluated on a ``block``-downsampled grid (the full (F, H, W) quadratic
    form is ~120 MB of HBM traffic per frame for 96 slots).  A block is
    marked when its *center* passes the gate inflated by the worst-case
    center-to-pixel Mahalanobis slack: for any pixel p in a block with
    center c, d_M(p) <= d_M(c) + ||p - c|| / sqrt(lambda_min(S)), so
    testing sqrt(md(c)) <= sqrt(gate) + slack guarantees the block mask is
    a superset of the exact pixel region for every ellipse size (including
    gates smaller than one block).  ``block=1`` gives the exact pixel mask.
    """
    h, w = shape
    Sinv = _inv_2x2(S)                                  # (F, 2, 2)
    hb = (h + block - 1) // block
    wb = (w + block - 1) // block
    ctr = (block - 1) * 0.5
    xs = jnp.arange(wb, dtype=S.dtype) * block + ctr
    ys = jnp.arange(hb, dtype=S.dtype) * block + ctr
    dx = xs[None, None, :] - centers[:, 0][:, None, None]   # (F, 1, Wb)
    dy = ys[None, :, None] - centers[:, 1][:, None, None]   # (F, Hb, 1)
    a = Sinv[:, 0, 0][:, None, None]
    b = Sinv[:, 0, 1][:, None, None]
    c = Sinv[:, 1, 1][:, None, None]
    md = a * dx * dx + 2.0 * b * dx * dy + c * dy * dy      # (F, Hb, Wb)
    if block == 1:
        return jnp.any((md <= gate) & visible[:, None, None], axis=0)
    # lambda_min of each 2x2 SPD S (closed form): worst-case Mahalanobis
    # length of an in-block offset is ||offset|| / sqrt(lambda_min)
    tr2 = 0.5 * (S[:, 0, 0] + S[:, 1, 1])
    disc = jnp.sqrt(jnp.maximum(
        tr2 * tr2 - (S[:, 0, 0] * S[:, 1, 1] - S[:, 0, 1] * S[:, 1, 0]),
        0.0))
    lam_min = jnp.maximum(tr2 - disc, 1e-12)                # (F,)
    max_off = jnp.sqrt(2.0) * (block - 1) * 0.5
    thresh = jnp.sqrt(jnp.asarray(gate, S.dtype)) + max_off / jnp.sqrt(lam_min)
    ok = jnp.sqrt(jnp.maximum(md, 0.0)) <= thresh[:, None, None]
    inside = jnp.any(ok & visible[:, None, None], axis=0)
    full = jnp.repeat(jnp.repeat(inside, block, axis=0), block, axis=1)
    return full[:h, :w]


def match_predictions(pred_uv: jnp.ndarray, pred_S: jnp.ndarray,
                      visible: jnp.ndarray, map_desc: jnp.ndarray,
                      kp_xy: jnp.ndarray, kp_valid: jnp.ndarray,
                      kp_desc: jnp.ndarray, gate: float,
                      ratio_coef: float,
                      distance_fn=brief.hamming_distance) -> Matches:
    """Gated 2-NN descriptor matching (matchPredictedFeatures, Matching.cpp:181-264).

    ``pred_uv`` (F, 2) predicted pixels (x, y); ``pred_S`` (F, 2, 2);
    ``kp_xy`` (K, 2) keypoint pixels (x, y); gate = scaled chi2 threshold.
    ``distance_fn`` is Hamming for binary descriptors or squared L2 for
    float ones (the two branches of Matching.cpp computeDistance:47-93).
    """
    F = pred_uv.shape[0]
    dtype = pred_uv.dtype

    dx = kp_xy[None, :, 0] - pred_uv[:, None, 0]         # (F, K)
    dy = kp_xy[None, :, 1] - pred_uv[:, None, 1]
    Sinv = _inv_2x2(pred_S)
    # explicit quadratic form: stays in f32 elementwise regardless of the
    # ambient matmul precision (bf16 dot inputs would round pixel coords)
    md = (Sinv[:, 0, 0][:, None] * dx * dx
          + 2.0 * Sinv[:, 0, 1][:, None] * dx * dy
          + Sinv[:, 1, 1][:, None] * dy * dy)
    gated = (md <= gate) & kp_valid[None, :] & visible[:, None]

    dist = distance_fn(map_desc, kp_desc)                # (F, K)
    BIG = (jnp.int32(1 << 20) if jnp.issubdtype(dist.dtype, jnp.integer)
           else jnp.asarray(1e30, dist.dtype))
    dist_g = jnp.where(gated, dist, BIG)

    # 2-NN (findBestNMatches, Matching.cpp:116-144) as two masked argmin
    # passes: lax.top_k(k=2) lowers to a full (F, K) sort (~9 us/frame
    # profiled); two min-reductions are a few fused VPU ops.  Ties break
    # to the lowest index in both formulations.
    d1 = jnp.min(dist_g, axis=1)
    best_idx = jnp.argmin(dist_g, axis=1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, dist_g.shape, 1)
    dist_g2 = jnp.where(k_iota == best_idx[:, None], BIG, dist_g)
    d2 = jnp.min(dist_g2, axis=1)

    n_cand = jnp.sum(gated, axis=1)
    # ratio test (matchICDescriptors, Matching.cpp:169-175): a single
    # candidate is accepted outright; otherwise best <= second * coef.
    accept = (n_cand == 1) | (
        (n_cand >= 2)
        & (d1.astype(dtype) <= d2.astype(dtype) * ratio_coef))
    matched = visible & (n_cand > 0) & accept

    z = jnp.where(matched[:, None], kp_xy[best_idx].astype(dtype), 0.0)
    desc = jnp.where(matched[:, None], kp_desc[best_idx],
                     jnp.zeros_like(kp_desc[best_idx]))
    # the descriptor path replaces the stored descriptor on every inlier
    # (update_counters), so the capture-pose anchor refreshes with it
    return Matches(z=z, matched=matched, desc=desc,
                   distance=jnp.where(matched, d1, BIG),
                   refreshed=matched)
