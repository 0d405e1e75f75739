"""STAR (CenSurE) center-surround detector, TPU-vectorized.

The reference's s3 experiment runs cv::StarFeatureDetector (STAR profile,
experiments/s3/config.yml:4; factory FeatureDetectorFactory.cpp:135-158 with
maxSize/responseThreshold/lineThresholdProjected/suppressNonmaxSize).  STAR
is OpenCV's CenSurE variant: a bi-level center-surround filter evaluated at
a fixed ladder of scales, spatial + scale non-max suppression, and an
edge/line suppression test on the response map.

TPU re-design: the octagonal CenSurE kernels become *box* center-surround
filters (the box variant from the CenSurE paper), computed for every pixel
and every scale from one integral image with four static slices per box --
O(scales) fused VPU passes over the frame, no per-keypoint work.  The line
test is the SIFT-style trace^2/det ratio of the response-map structure
tensor, evaluated per scale with a scale-proportional window.  Parity with
cv::StarDetector is behavioral (which image structures score highly), not
bit-exact; trajectory-level parity is what SURVEY.md section 7.3 requires.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.vision.harris import _box_sum, _shift

# CenSurE scale ladder (filter half-sizes), as in OpenCV's StarDetector.
SCALE_LADDER = (1, 2, 3, 4, 6, 8, 11, 16, 22, 32, 45, 64, 90, 128)


def star_sizes(max_size: int) -> tuple:
    """Filter half-sizes evaluated for a given config maxSize (>=1)."""
    sizes = tuple(s for s in SCALE_LADDER if s <= max_size)
    return sizes if sizes else (1,)


def _integral(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-padded integral image with a zero top row / left column.

    The image mean is subtracted first: a raw 480x640 uint8 integral peaks
    near 9e7, beyond f32's 2^24 integer range, so box-sum differences
    would carry O(8) intensity-unit error.  Centering keeps the running
    sums ~100x smaller; center-surround responses are differences of
    means, so the shift cancels exactly.
    """
    p = jnp.pad(img, pad, mode="edge").astype(jnp.float32)
    p = p - jnp.mean(p)
    # cumsum as triangular-ones matmuls: the 2-D jnp.cumsum lowered to two
    # giant relayout fusions that dominate the vmapped (multi-stream) step
    # (~900 us each at B=8); the MXU prefix-sum is layout-clean, batches
    # natively under vmap, and runs at full f32 accumulation.  (Summation
    # order differs from sequential cumsum by fp reassociation only.)
    n0, n1 = p.shape
    t0 = jnp.tril(jnp.ones((n0, n0), jnp.float32))
    t1 = jnp.triu(jnp.ones((n1, n1), jnp.float32))
    # 3-pass bf16 (HIGH): with one operand an exact 0/1 triangle, the
    # split-product error is ~2^-24 relative per term and accumulation
    # stays f32, so integral entries (magnitude ~1e4 after centering)
    # carry ~1e-3 absolute error -- box-mean differences divide it by the
    # box area.  Measured: the 6-pass HIGHEST variant cost 39 us/frame of
    # the two dominant vision fusions; HIGH halves it with no detector
    # ground-truth or golden-trajectory movement.
    ii = jax.lax.dot_general(
        jax.lax.dot_general(t0, p, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGH),
        t1, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGH)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def _box_mean_from_integral(ii: jnp.ndarray, pad: int, h: int, w: int,
                            n: int) -> jnp.ndarray:
    """(H, W) mean over the centered (2n+1)^2 box, from the integral image.

    For center (y, x) in image coords the box spans rows [y-n, y+n]; with
    the integral's (pad+1) offset that is ii[y+pad+n+1] - ii[y+pad-n].
    """
    top = pad - n
    bot = pad + n + 1
    s = (jax.lax.slice(ii, (bot, bot), (bot + h, bot + w))
         - jax.lax.slice(ii, (top, bot), (top + h, bot + w))
         - jax.lax.slice(ii, (bot, top), (bot + h, top + w))
         + jax.lax.slice(ii, (top, top), (top + h, top + w)))
    return s / float((2 * n + 1) ** 2)


def star_responses(gray: jnp.ndarray, max_size: int = 16
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Center-surround responses at every scale.

    Returns (response (S, H, W) signed float32, sizes tuple).  Response at
    scale n = mean(inner box, half-size n) - mean(outer box, half-size 2n):
    positive for bright blobs, negative for dark ones.
    """
    sizes = star_sizes(max_size)
    h, w = gray.shape
    pad = 2 * max(sizes) + 1
    ii = _integral(gray, pad)
    rs = []
    for n in sizes:
        inner = _box_mean_from_integral(ii, pad, h, w, n)
        outer = _box_mean_from_integral(ii, pad, h, w, 2 * n)
        rs.append(inner - outer)
    return jnp.stack(rs), sizes


def star_scores(gray: jnp.ndarray, max_size: int = 16,
                response_threshold: float = 30.0,
                line_threshold_projected: float = 10.0,
                suppress_nonmax_size: int = 5) -> jnp.ndarray:
    """Per-pixel STAR corner score map (0 where suppressed).

    Scale-space maximum of |response|, line-suppressed per scale, then
    thresholded.  Spatial NMS is left to the caller's non_max_suppress /
    top-K stage (suppress_nonmax_size sets the recommended NMS radius).
    """
    del suppress_nonmax_size  # NMS radius applied by the caller
    resp, sizes = star_responses(gray, max_size)

    # scale-space maximum of |response| first ...
    best = jnp.max(jnp.abs(resp), axis=0)

    # ... then ONE line/edge-suppression pass on the merged response map:
    # structure tensor over a fixed small window, keep tr^2/det < threshold
    # (SIFT-style edge test; OpenCV projects the response gradient the same
    # way).  Per-scale windows would multiply the HBM traffic of this
    # whole-frame pass by ~10x for no behavioral gain: an elongated ridge
    # in any per-scale response is a ridge in the scale-max too.
    rx = 0.5 * (_shift(best, 0, 1) - _shift(best, 0, -1))
    ry = 0.5 * (_shift(best, 1, 0) - _shift(best, -1, 0))
    sxx = _box_sum(rx * rx, 2)
    syy = _box_sum(ry * ry, 2)
    sxy = _box_sum(rx * ry, 2)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    not_line = (det > 0) & (tr * tr < line_threshold_projected * det)

    best = jnp.where(not_line, best, 0.0)
    return jnp.where(best >= response_threshold, best, 0.0)
