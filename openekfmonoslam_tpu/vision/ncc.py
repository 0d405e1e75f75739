"""NCC patch-correlation active-search matching (detection-free).

The reference matches detected keypoints' descriptors inside each
prediction's uncertainty ellipse (Matching.cpp:181-264).  The classic
Davison MonoSLAM alternative -- and the BASELINE.json north star's matcher
-- correlates a stored appearance *patch* of each landmark against every
pixel of its gate region instead, so matching does not depend on the
corner re-detecting.  This module implements it TPU-first:

  * each landmark stores a zero-mean unit-norm patch vector (held in the
    SlamState descriptor slots, kind="PATCH");
  * per frame, a fixed search window around every predicted pixel is
    dynamically sliced out, and all F windows are correlated against their
    patches with ONE grouped convolution (feature_group_count=F) -- the
    MXU does the F x search^2 x patch^2 work in a single fused op;
  * local window statistics for the normalization come from box-sum
    convolutions of the window and its square;
  * candidate positions are gated by the same Mahalanobis test as the
    descriptor matcher (d^T S^-1 d <= gate) and the best NCC above
    ``min_corr`` wins.

Everything is statically shaped: F search windows of (2*search_radius+1)^2
candidate centers each, masked where invalid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.vision.matching import Matches, _inv_2x2


def extract_patches(smoothed: jnp.ndarray, yx: jnp.ndarray,
                    radius: int) -> jnp.ndarray:
    """(K, (2r+1)^2) zero-mean unit-norm patch vectors at integer pixels."""
    h, w = smoothed.shape
    d = jnp.arange(-radius, radius + 1)
    ys = jnp.clip(yx[:, 0:1] + d[None, :], 0, h - 1)          # (K, P)
    xs = jnp.clip(yx[:, 1:2] + d[None, :], 0, w - 1)
    patch = smoothed[ys[:, :, None], xs[:, None, :]]          # (K, P, P)
    k = patch.shape[0]
    v = patch.reshape(k, -1).astype(jnp.float32)
    v = v - jnp.mean(v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
    return v / n


def extract_patches_bilinear(smoothed: jnp.ndarray, yx: jnp.ndarray,
                             radius: int) -> jnp.ndarray:
    """(K, (2r+1)^2) zero-mean unit-norm patches at SUBPIXEL centers.

    Bilinear resampling centers the template exactly on the matched
    subpixel position.  extract_patches rounds to the nearest integer
    pixel, which plants a systematic <=0.5 px offset into the template:
    every later correlation peak inherits that offset as measurement
    bias, and refresh-to-refresh the biases integrate into trajectory
    drift.  Used for template refresh (matched positions are subpixel);
    initialization keeps the integer path (detections are integer).
    """
    h, w = smoothed.shape
    img = smoothed.astype(jnp.float32)
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    yf = yx[:, 0:1].astype(jnp.float32) + d[None, :]          # (K, P)
    xf = yx[:, 1:2].astype(jnp.float32) + d[None, :]
    y0 = jnp.clip(jnp.floor(yf), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xf), 0, w - 2).astype(jnp.int32)
    ay = jnp.clip(yf - y0.astype(jnp.float32), 0.0, 1.0)      # (K, P)
    ax = jnp.clip(xf - x0.astype(jnp.float32), 0.0, 1.0)

    def corner(dy, dx):
        return img[(y0 + dy)[:, :, None], (x0 + dx)[:, None, :]]

    wy0, wy1 = (1.0 - ay)[:, :, None], ay[:, :, None]
    wx0, wx1 = (1.0 - ax)[:, None, :], ax[:, None, :]
    patch = (corner(0, 0) * wy0 * wx0 + corner(0, 1) * wy0 * wx1
             + corner(1, 0) * wy1 * wx0 + corner(1, 1) * wy1 * wx1)
    k = patch.shape[0]
    v = patch.reshape(k, -1)
    v = v - jnp.mean(v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
    return v / n


def ncc_match(smoothed: jnp.ndarray, pred_uv: jnp.ndarray,
              pred_S: jnp.ndarray, visible: jnp.ndarray,
              patches: jnp.ndarray, gate: float,
              patch_radius: int, search_radius: int,
              min_corr: float = 0.8,
              refresh_below: float = 0.93) -> Matches:
    """Correlate every landmark's patch over its gated search window.

    ``patches`` (F, (2pr+1)^2) normalized patch vectors; ``pred_uv``
    (F, 2) predicted pixels (x, y).  Returns the same Matches structure as
    the descriptor matcher; ``desc`` holds the patch re-extracted at the
    matched position (for the map's descriptor refresh), ``distance``
    holds 1 - NCC scaled by 1000 (int32, diagnostic).
    """
    h, w = smoothed.shape
    f = pred_uv.shape[0]
    pr, sr = patch_radius, search_radius
    ps = 2 * pr + 1          # patch side
    ss = 2 * sr + 1          # candidate-center grid side
    rs = ss + ps - 1         # window side needed to cover all candidates

    img = smoothed.astype(jnp.float32)
    cx = jnp.round(pred_uv[:, 0]).astype(jnp.int32)
    cy = jnp.round(pred_uv[:, 1]).astype(jnp.int32)
    y0 = jnp.clip(cy - sr - pr, 0, h - rs)
    x0 = jnp.clip(cx - sr - pr, 0, w - rs)

    def slice_window(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (rs, rs))

    windows = jax.vmap(slice_window)(y0, x0)                  # (F, rs, rs)

    # grouped cross-correlation: input (1, F, rs, rs) * kernel (F, 1, ps, ps)
    kernel = patches.reshape(f, 1, ps, ps)
    corr = jax.lax.conv_general_dilated(
        windows[None], kernel, window_strides=(1, 1), padding="VALID",
        feature_group_count=f,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)[0]                # (F, ss, ss)

    # local window mean/var over each ps x ps support via box-sum convs
    ones = jnp.ones((f, 1, ps, ps), jnp.float32)
    wsum = jax.lax.conv_general_dilated(
        windows[None], ones, (1, 1), "VALID", feature_group_count=f,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)[0]
    w2sum = jax.lax.conv_general_dilated(
        (windows * windows)[None], ones, (1, 1), "VALID",
        feature_group_count=f,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)[0]
    n = float(ps * ps)
    var = jnp.maximum(w2sum - wsum * wsum / n, 0.0)
    ncc = corr / jnp.sqrt(var + 1e-8)                         # (F, ss, ss)

    # candidate center (x, y) of each grid cell, Mahalanobis-gated
    dyi = jax.lax.broadcasted_iota(jnp.int32, (ss, ss), 0)
    dxi = jax.lax.broadcasted_iota(jnp.int32, (ss, ss), 1)
    cand_y = (y0[:, None, None] + pr + dyi[None]).astype(pred_uv.dtype)
    cand_x = (x0[:, None, None] + pr + dxi[None]).astype(pred_uv.dtype)
    dx = cand_x - pred_uv[:, 0][:, None, None]
    dy = cand_y - pred_uv[:, 1][:, None, None]
    Sinv = _inv_2x2(pred_S)
    md = (Sinv[:, 0, 0][:, None, None] * dx * dx
          + 2.0 * Sinv[:, 0, 1][:, None, None] * dx * dy
          + Sinv[:, 1, 1][:, None, None] * dy * dy)
    ok = (md <= gate) & visible[:, None, None]
    ncc_g = jnp.where(ok, ncc, -2.0)

    flat = ncc_g.reshape(f, ss * ss)
    best = jnp.argmax(flat, axis=-1)
    best_ncc = jnp.take_along_axis(flat, best[:, None], axis=-1)[:, 0]
    by = best // ss
    bx = best % ss
    zx = jnp.take_along_axis(cand_x.reshape(f, -1), best[:, None], 1)[:, 0]
    zy = jnp.take_along_axis(cand_y.reshape(f, -1), best[:, None], 1)[:, 0]

    # subpixel peak: 1-D parabola fits through the 3-point neighborhoods.
    # Integer-pixel NCC peaks cost ~5x the lateral drift of the descriptor
    # matcher on the s3 run; the quadratic refinement recovers it.
    def neighbor(dy, dx):
        iy = jnp.clip(by + dy, 0, ss - 1)
        ix = jnp.clip(bx + dx, 0, ss - 1)
        return jnp.take_along_axis(flat, (iy * ss + ix)[:, None], 1)[:, 0]

    c0 = best_ncc
    def para_offset(m, p):
        denom = m - 2.0 * c0 + p
        off = jnp.where(jnp.abs(denom) > 1e-9,
                        0.5 * (m - p) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    # invalid neighbors carry the -2 sentinel; fall back to no offset there
    xm, xp = neighbor(0, -1), neighbor(0, 1)
    ym, yp = neighbor(-1, 0), neighbor(1, 0)
    dx_sub = jnp.where((xm > -1.5) & (xp > -1.5), para_offset(xm, xp), 0.0)
    dy_sub = jnp.where((ym > -1.5) & (yp > -1.5), para_offset(ym, yp), 0.0)
    zx = zx + dx_sub.astype(zx.dtype)
    zy = zy + dy_sub.astype(zy.dtype)

    matched = visible & (best_ncc >= min_corr)
    z = jnp.where(matched[:, None], jnp.stack([zx, zy], axis=-1), 0.0)

    # LAZY patch refresh (MapManagement descriptor-refresh analog,
    # MapManagement.cpp:104-112): re-storing the template every frame
    # accumulates sub-pixel template drift; keep the stored patch while it
    # still correlates strongly and only refresh when appearance has
    # genuinely changed (best NCC below ``refresh_below``).
    zyx = jnp.stack([zy, zx], -1)
    new_patches = extract_patches_bilinear(img, zyx, pr)
    refresh = matched & (best_ncc < refresh_below)
    desc = jnp.where(refresh[:, None], new_patches, patches)

    dist = jnp.round((1.0 - best_ncc) * 1000.0).astype(jnp.int32)
    return Matches(z=z, matched=matched, desc=desc,
                   distance=jnp.where(matched, dist, jnp.int32(1 << 20)))
