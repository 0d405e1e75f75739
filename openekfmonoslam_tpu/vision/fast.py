"""FAST-9/16 corner detection as whole-image vectorized JAX.

The reference delegates detection to OpenCV's detector factory
(FeatureDetectorFactory.cpp; the s3 experiment uses STAR, the sample
configs use FAST with thresholds 50/150).  The TPU build implements the
FAST segment test natively: for every pixel, the 16-pixel Bresenham ring of
radius 3 is materialized with `jnp.roll` shifts, the brighter/darker
comparisons are packed into 16-bit masks, and the "9 contiguous" test is 8
shift-ANDs on the doubled mask -- branch-free VPU work across the whole
image at once.  No per-keypoint loops anywhere.

Score: sum over qualifying ring pixels of |I(ring) - I(p)| - t (the
original FAST paper's corner strength), used for non-max suppression and
top-K selection.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Bresenham circle radius 3, clockwise from 12 o'clock: (dy, dx)
RING_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9  # FAST-9


class Keypoints(NamedTuple):
    yx: jnp.ndarray      # (K, 2) int32 row, col
    score: jnp.ndarray   # (K,) float32
    valid: jnp.ndarray   # (K,) bool


def _contiguous_arc(mask16: jnp.ndarray) -> jnp.ndarray:
    """True where a 16-bit circular mask contains >= ARC_LEN consecutive 1s.

    Doubles the mask into 32 bits so circular runs become linear, then ANDs
    8 shifted copies: surviving bits mark run starts of length >= 9.
    """
    m = mask16.astype(jnp.uint32)
    d = m | (m << 16)
    r = d
    for s in range(1, ARC_LEN):
        r = r & (d >> s)
    return (r & jnp.uint32(0xFFFF)) != 0


def fast_scores(gray: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Per-pixel FAST-9 corner score (0 where not a corner).

    ``gray`` is (H, W) in any numeric dtype; compared in int32/float32.
    """
    img = gray.astype(jnp.float32)
    t = jnp.float32(threshold)

    brighter_bits = jnp.zeros(img.shape, dtype=jnp.uint32)
    darker_bits = jnp.zeros(img.shape, dtype=jnp.uint32)
    excess = jnp.zeros(img.shape, dtype=jnp.float32)

    rings = []
    for k, (dy, dx) in enumerate(RING_OFFSETS):
        ring = jnp.roll(img, (-dy, -dx), axis=(0, 1))
        rings.append(ring)
        brighter = ring > img + t
        darker = ring < img - t
        bit = jnp.uint32(1 << k)
        brighter_bits = brighter_bits | jnp.where(brighter, bit, 0)
        darker_bits = darker_bits | jnp.where(darker, bit, 0)
        excess = excess + jnp.where(brighter | darker,
                                    jnp.abs(ring - img) - t, 0.0)

    corner = _contiguous_arc(brighter_bits) | _contiguous_arc(darker_bits)

    # exclude the 3px border (ring wraps around via roll)
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)

    return jnp.where(corner & inside, excess, 0.0)


def non_max_suppress(score: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Keep only local maxima in a (2r+1)^2 window (ties keep all)."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    return jnp.where((score >= pooled) & (score > 0), score, 0.0)


def subpixel_refine(score_raw: jnp.ndarray, xy: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """Quadratic subpixel refinement of keypoint positions.

    ``score_raw`` is the *pre-NMS* corner score map (NMS zeroes the
    neighbors the parabola needs); ``xy`` is (K, 2) pixel (x, y).  Fits
    1-D parabolas through the 3-point neighborhoods and shifts each
    position by the (clipped to +-0.5) peak offset.  Measurements handed
    to the EKF stop being quantized to the pixel grid, which directly
    reduces lateral drift.
    """
    h, w = score_raw.shape
    ix = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 1, w - 2)
    iy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 1, h - 2)

    def at(dy, dx):
        return score_raw[iy + dy, ix + dx]

    c0 = at(0, 0)

    def para(m, p):
        denom = m - 2.0 * c0 + p
        off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (m - p) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    dx = para(at(0, -1), at(0, 1))
    dy = para(at(-1, 0), at(1, 0))
    shift = jnp.stack([dx, dy], axis=-1).astype(xy.dtype)
    return xy + shift * valid[:, None].astype(xy.dtype)


@partial(jax.jit, static_argnames=("max_keypoints", "nonmax_radius"))
def detect_keypoints(score_nms: jnp.ndarray, pixel_mask: jnp.ndarray,
                     max_keypoints: int,
                     nonmax_radius: int = 2) -> Keypoints:
    """Top-K corners from an NMS'd score map restricted to ``pixel_mask``.

    Replaces the reference's masked `detector->detect(image, mask)` calls
    (Matching.cpp:206, DetectNewImageFeatures.cpp:343): the mask is a
    per-pixel boolean (union of gate ellipses or its complement) instead of
    a rasterized cv::Mat.
    """
    h, w = score_nms.shape
    masked = jnp.where(pixel_mask, score_nms, 0.0)
    flat = masked.reshape(-1)
    # approx_max_k uses the TPU's blocked reduction (~2x faster than a full
    # sort over H*W); recall ~0.95 only reorders which weak corners make
    # the tail of the budget.
    top_scores, top_idx = jax.lax.approx_max_k(flat, max_keypoints)
    yx = jnp.stack([top_idx // w, top_idx % w], axis=-1).astype(jnp.int32)
    return Keypoints(yx=yx, score=top_scores, valid=top_scores > 0)
