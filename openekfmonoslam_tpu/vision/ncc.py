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
    P = 2 * radius + 1
    # The sample grid is the subpixel center plus INTEGER offsets, so the
    # fractional part is one scalar per keypoint per axis: slice a
    # (P+1, P+1) window per keypoint (vmapped dynamic_slice -- a DMA,
    # not a scattered gather: the per-element gather form measured
    # ~10 ns/element, ~0.9 ms/frame at K=96) and bilinear-blend its four
    # shifted sub-views with those scalar weights.
    yf = yx[:, 0].astype(jnp.float32)
    xf = yx[:, 1].astype(jnp.float32)
    y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32) - radius, 0, h - P - 1)
    x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32) - radius, 0, w - P - 1)
    # fractional weights relative to the clipped window origin: exact
    # bilinear everywhere the window wasn't clipped (keypoints are
    # border-masked beyond the patch radius anyway)
    ay = jnp.clip(yf - radius - y0.astype(jnp.float32), 0.0, 1.0)[:, None,
                                                                 None]
    ax = jnp.clip(xf - radius - x0.astype(jnp.float32), 0.0, 1.0)[:, None,
                                                                  None]

    win = jax.vmap(lambda y, x: jax.lax.dynamic_slice(
        img, (y, x), (P + 1, P + 1)))(y0, x0)                 # (K, P+1, P+1)
    patch = (win[:, :-1, :-1] * (1 - ay) * (1 - ax)
             + win[:, :-1, 1:] * (1 - ay) * ax
             + win[:, 1:, :-1] * ay * (1 - ax)
             + win[:, 1:, 1:] * ay * ax)
    k = patch.shape[0]
    v = patch.reshape(k, -1)
    v = v - jnp.mean(v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
    return v / n


def warp_templates(patches: jnp.ndarray, patch_pose: jnp.ndarray,
                   feats: jnp.ndarray, is_xyz: jnp.ndarray,
                   cam7: jnp.ndarray, pred_uv: jnp.ndarray,
                   visible: jnp.ndarray, fx: float, fy: float,
                   cx: float, cy: float, patch_radius: int) -> jnp.ndarray:
    """Predict each stored template's current appearance by the
    camera-motion-induced homography of its patch plane (Davison-style
    active search; the reference never warps -- its Matching.cpp re-detects
    corners instead, so this has no reference counterpart).

    Each landmark's patch is modelled as a small plane through its
    estimated 3D point, fronto-parallel to the *capture* view (normal =
    capture ray).  For the current camera, every template pixel's source
    location in the stored template follows the plane homography

        X_c0 = (R_rel + t_rel n1^T / d1) X_c1,
        H_0<-1 = K (R_rel + t_rel n1^T / d1) K^-1,

    with R_rel = R0^T R1, t_rel = R0^T (r1 - r0), n1 the plane normal in
    the current camera frame and d1 the plane distance.  The stored patch
    is bilinearly resampled at the warped grid and re-normalized.  Slots
    with no stored pose (q == 0), behind-plane geometry, or not currently
    visible fall back to the unwarped template.

    ``patches`` (F, ps*ps) normalized vectors; ``patch_pose`` (F, 7)
    capture (r, q); ``feats`` (F, 6) slot parameters; ``pred_uv`` (F, 2)
    predicted pixel centers.  Returns (F, ps*ps).
    """
    from openekfmonoslam_tpu.core import quaternion as quat

    f = patches.shape[0]
    pr = patch_radius
    ps = 2 * pr + 1

    fcast = jnp.float32
    feats = feats.astype(fcast)
    cam7 = cam7.astype(fcast)
    pred_uv = pred_uv.astype(fcast)

    # landmark world point (inverse-depth slots through anchor + m/rho)
    m = jax.vmap(quat.directional_vector)(feats[:, 3], feats[:, 4])
    rho = feats[:, 5]
    rho_s = jnp.where(jnp.abs(rho) < 1e-12, 1e-12, rho)
    p_w = jnp.where(is_xyz[:, None], feats[:, 0:3],
                    feats[:, 0:3] + m / rho_s[:, None])

    r0, q0 = patch_pose[:, 0:3], patch_pose[:, 3:7]
    has_pose = jnp.sum(q0 * q0, axis=-1) > 0.25
    q0_safe = jnp.where(has_pose[:, None], q0,
                        jnp.asarray([1.0, 0, 0, 0], fcast)[None])
    q0_safe = q0_safe / jnp.linalg.norm(q0_safe, axis=-1, keepdims=True)
    R0 = jax.vmap(quat.to_rotation_matrix)(q0_safe)        # (F, 3, 3)
    r1, q1 = cam7[0:3], cam7[3:7]
    R1 = quat.to_rotation_matrix(q1 / jnp.linalg.norm(q1)) # (3, 3)

    to_p = p_w - r0                                        # capture ray
    d0 = jnp.linalg.norm(to_p, axis=-1)
    n_w = to_p / jnp.maximum(d0, 1e-9)[:, None]            # plane normal
    d1 = jnp.sum(n_w * (p_w - r1[None, :]), axis=-1)       # (F,)

    R0T = jnp.swapaxes(R0, 1, 2)
    R_rel = jnp.einsum("fij,jk->fik", R0T, R1)             # (F, 3, 3)
    t_rel = jnp.einsum("fij,j->fi", R0T, r1) - jnp.einsum(
        "fij,fj->fi", R0T, r0)                             # R0^T (r1 - r0)
    n1 = jnp.einsum("ji,fj->fi", R1, n_w)                  # R1^T n_w

    d1_ok = d1 > 1e-3
    d1_safe = jnp.where(d1_ok, d1, 1.0)
    M = R_rel + t_rel[:, :, None] * n1[:, None, :] / d1_safe[:, None, None]

    K = jnp.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], fcast)
    Kinv = jnp.asarray([[1.0 / fx, 0.0, -cx / fx],
                        [0.0, 1.0 / fy, -cy / fy],
                        [0.0, 0.0, 1.0]], fcast)
    H = jnp.einsum("ij,fjk,kl->fil", K, M, Kinv)           # (F, 3, 3)

    # warp the current-template pixel grid into capture-template coords
    d = jnp.arange(-pr, pr + 1, dtype=fcast)
    zero = jnp.zeros((f, ps, ps), fcast)
    gx = pred_uv[:, 0][:, None, None] + d[None, None, :] + zero
    gy = pred_uv[:, 1][:, None, None] + d[None, :, None] + zero
    ones = jnp.ones_like(gx)
    u = jnp.stack([gx, gy, ones], axis=-1)                 # (F, ps, ps, 3)
    u0h = jnp.einsum("fij,fabj->fabi", H, u)
    wz = jnp.where(jnp.abs(u0h[..., 2]) > 1e-6, u0h[..., 2], 1.0)
    u0 = u0h[..., 0:2] / wz[..., None]                     # (F, ps, ps, 2)
    # the center maps to the capture projection of p; template coords are
    # relative to it, so subtract the warped center (differential warp)
    c = jnp.stack([pred_uv[:, 0], pred_uv[:, 1],
                   jnp.ones((f,), fcast)], axis=-1)
    c0h = jnp.einsum("fij,fj->fi", H, c)
    cz = jnp.where(jnp.abs(c0h[..., 2]) > 1e-6, c0h[..., 2], 1.0)
    c0 = c0h[..., 0:2] / cz[..., None]                     # (F, 2)
    sx = u0[..., 0] - c0[:, None, None, 0] + pr            # (F, ps, ps)
    sy = u0[..., 1] - c0[:, None, None, 1] + pr

    # bilinear resample the stored template (edge clamp).  Per-pixel
    # gathers from T cost ~10 ns/element on TPU (~0.9 ms/frame at F=96,
    # 4 taps x ps^2); instead the bilinear interpolation is written as
    # two one-hot interpolation matrices contracted on the MXU:
    #   warped[p] = sum_{qy,qx} Ay[p,qy] T[qy,qx] Ax[p,qx]
    # with Ay/Ax carrying the two bilinear weights per output pixel --
    # built by pure comparisons against an iota, no gathers anywhere.
    T = patches.reshape(f, ps, ps)
    x0i = jnp.clip(jnp.floor(sx), 0, ps - 2).astype(jnp.int32)
    y0i = jnp.clip(jnp.floor(sy), 0, ps - 2).astype(jnp.int32)
    ax = jnp.clip(sx - x0i, 0.0, 1.0)                      # (F, ps, ps)
    ay = jnp.clip(sy - y0i, 0.0, 1.0)
    q = jnp.arange(ps)
    Ay = (jnp.where(q == y0i[..., None], 1.0 - ay[..., None], 0.0)
          + jnp.where(q == y0i[..., None] + 1, ay[..., None], 0.0)
          )                                                # (F, ps, ps, ps)
    Ax = (jnp.where(q == x0i[..., None], 1.0 - ax[..., None], 0.0)
          + jnp.where(q == x0i[..., None] + 1, ax[..., None], 0.0))
    warped = jnp.einsum("faby,fyx,fabx->fab", Ay, T, Ax)
    v = warped.reshape(f, ps * ps)
    v = v - jnp.mean(v, axis=-1, keepdims=True)
    nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
    v = v / nrm

    ok = has_pose & d1_ok & visible
    return jnp.where(ok[:, None], v, patches)


def ncc_match(smoothed: jnp.ndarray, pred_uv: jnp.ndarray,
              pred_S: jnp.ndarray, visible: jnp.ndarray,
              patches: jnp.ndarray, gate: float,
              patch_radius: int, search_radius: int,
              min_corr: float = 0.8,
              refresh_below: float = 0.93,
              corr_patches: jnp.ndarray | None = None) -> Matches:
    """Correlate every landmark's patch over its gated search window.

    ``patches`` (F, (2pr+1)^2) normalized patch vectors; ``pred_uv``
    (F, 2) predicted pixels (x, y).  Returns the same Matches structure as
    the descriptor matcher; ``desc`` holds the patch re-extracted at the
    matched position (for the map's descriptor refresh), ``distance``
    holds 1 - NCC scaled by 1000 (int32, diagnostic).

    ``corr_patches`` optionally supplies homography-warped templates
    (warp_templates) to CORRELATE with, while ``patches`` remain the
    stored originals that survive in ``desc`` when no refresh fires --
    storing a warped template back would compound the warp across frames.
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

    # grouped cross-correlation: input (1, F, rs, rs) * kernel (F, 1, ps, ps).
    # With warped templates supplied, correlate BOTH the stored original
    # and the warped prediction (2F groups) and let each landmark's
    # better-scoring template win: the warp helps under scale/parallax
    # change but can hurt when the fronto-parallel plane assumption is
    # wrong, so the max over the two is never worse than either alone.
    n_tpl = 1 if corr_patches is None else 2
    if corr_patches is None:
        kernel = patches.reshape(f, 1, ps, ps)
        conv_in = windows[None]
    else:
        kernel = jnp.concatenate(
            [patches, corr_patches], axis=0).reshape(2 * f, 1, ps, ps)
        conv_in = jnp.concatenate([windows, windows], axis=0)[None]
    corr = jax.lax.conv_general_dilated(
        conv_in, kernel, window_strides=(1, 1), padding="VALID",
        feature_group_count=n_tpl * f,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)[0]          # (n_tpl*F, ss, ss)

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
    denom = jnp.sqrt(var + 1e-8)                              # (F, ss, ss)

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

    if n_tpl == 1:
        ncc_g = jnp.where(ok, corr / denom, -2.0)
    else:
        ncc2 = corr.reshape(2, f, ss, ss) / denom[None]
        # gate BOTH template maps BEFORE the winner selection (ADVICE
        # r3: a spurious peak outside the Mahalanobis gate or in
        # edge-clamped window rows must not pick the worse template),
        # then winner per landmark = template with the higher GATED
        # peak; its whole gated map feeds the argmax + subpixel fit
        # (mixing maps per-cell would corrupt parabola neighborhoods)
        ncc2_g = jnp.where(ok[None], ncc2, -2.0)
        peak = jnp.max(ncc2_g.reshape(2, f, ss * ss), axis=-1)  # (2, F)
        win = jnp.argmax(peak, axis=0)                          # (F,)
        ncc_g = ncc2_g[win, jnp.arange(f)]                      # (F, ss, ss)

    flat = ncc_g.reshape(f, ss * ss)
    best = jnp.argmax(flat, axis=-1)
    best_ncc = jnp.take_along_axis(flat, best[:, None], axis=-1)[:, 0]
    by = best // ss
    bx = best % ss
    zx = jnp.take_along_axis(cand_x.reshape(f, -1), best[:, None], 1)[:, 0]
    zy = jnp.take_along_axis(cand_y.reshape(f, -1), best[:, None], 1)[:, 0]

    # subpixel peak: least-squares 2-D quadratic over the 3x3 neighborhood
    # (closed form on the unit grid).  Integer-pixel NCC peaks cost ~5x
    # the lateral drift of the descriptor matcher on the s3 run; the 1-D
    # parabola pair recovered lateral but biases when the correlation
    # ridge is tilted (shear/parallax) -- the full quadratic (with the xy
    # cross term) does not.  Falls back to the 1-D fits when the 3x3
    # support crosses the gate (invalid cells carry the -2 sentinel).
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

    grid = [(dy, dx, neighbor(dy, dx))
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    all_valid = jnp.ones_like(c0, bool)
    S0 = Sx = Sy = Sxx = Syy = Sxy = 0.0
    for dy, dx, v in grid:
        all_valid = all_valid & (v > -1.5)
        S0 = S0 + v
        Sx = Sx + v * dx
        Sy = Sy + v * dy
        Sxx = Sxx + v * (dx * dx)
        Syy = Syy + v * (dy * dy)
        Sxy = Sxy + v * (dx * dy)
    # LS coefficients of a + bx + cy + dxx x^2 + e xy + fyy y^2
    b = Sx / 6.0
    cc = Sy / 6.0
    e = Sxy / 4.0
    dxx = (3.0 * Sxx - 2.0 * S0) / 6.0
    fyy = (3.0 * Syy - 2.0 * S0) / 6.0
    det = 4.0 * dxx * fyy - e * e
    concave = (dxx < 0) & (det > 1e-9)
    det_safe = jnp.where(concave, det, 1.0)
    dx2 = jnp.clip(-(2.0 * fyy * b - e * cc) / det_safe, -0.5, 0.5)
    dy2 = jnp.clip(-(2.0 * dxx * cc - e * b) / det_safe, -0.5, 0.5)

    xm, xp = neighbor(0, -1), neighbor(0, 1)
    ym, yp = neighbor(-1, 0), neighbor(1, 0)
    dx1 = jnp.where((xm > -1.5) & (xp > -1.5), para_offset(xm, xp), 0.0)
    dy1 = jnp.where((ym > -1.5) & (yp > -1.5), para_offset(ym, yp), 0.0)
    use2d = all_valid & concave
    dx_sub = jnp.where(use2d, dx2, dx1)
    dy_sub = jnp.where(use2d, dy2, dy1)
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
    # Matched subpixel positions are NOT border-masked; within a patch
    # radius of the border extract_patches_bilinear's window-origin clip
    # re-centers the sample window, so a refresh there would store a
    # shifted template and corrupt later correlation.  Keep the old
    # template for border matches.
    h_img, w_img = img.shape
    in_interior = ((zy >= pr + 1) & (zy < h_img - pr - 1)
                   & (zx >= pr + 1) & (zx < w_img - pr - 1))
    refresh = matched & (best_ncc < refresh_below) & in_interior
    desc = jnp.where(refresh[:, None], new_patches, patches)

    dist = jnp.round((1.0 - best_ncc) * 1000.0).astype(jnp.int32)
    return Matches(z=z, matched=matched, desc=desc,
                   distance=jnp.where(matched, dist, jnp.int32(1 << 20)),
                   refreshed=refresh)
