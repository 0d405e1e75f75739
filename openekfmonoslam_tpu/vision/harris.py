"""Harris / Shi-Tomasi corner scoring as whole-image vectorized JAX.

The reference builds cv::FeatureDetector instances from config profiles
(FeatureDetectorFactory.cpp:51-165); ORB internally ranks FAST corners by
the Harris response, and GFTT-style detectors use the Shi-Tomasi minimum
eigenvalue.  The TPU build computes both from one structure tensor pass:
central-difference gradients (static padded slices), elementwise products,
and a separable box sum -- all fused VPU work, no convolutions, no loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-padded static shift: out[y, x] = img[y + dy, x + dx]."""
    h, w = img.shape
    r = max(abs(dy), abs(dx))
    if r == 0:
        return img
    p = jnp.pad(img, r, mode="edge")
    return jax.lax.slice(p, (r + dy, r + dx), (r + dy + h, r + dx + w))


def _box_sum(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable (2r+1)^2 box sum via shift-and-add (edge padded)."""
    out = img
    acc = jnp.zeros_like(img)
    for d in range(-radius, radius + 1):
        acc = acc + _shift(out, d, 0)
    out2 = jnp.zeros_like(img)
    for d in range(-radius, radius + 1):
        out2 = out2 + _shift(acc, 0, d)
    return out2


def gradients(gray: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference image gradients (Ix, Iy), float32."""
    img = gray.astype(jnp.float32)
    ix = 0.5 * (_shift(img, 0, 1) - _shift(img, 0, -1))
    iy = 0.5 * (_shift(img, 1, 0) - _shift(img, -1, 0))
    return ix, iy


def structure_tensor(gray: jnp.ndarray, window_radius: int = 2
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Windowed second-moment matrix entries (Sxx, Syy, Sxy)."""
    ix, iy = gradients(gray)
    sxx = _box_sum(ix * ix, window_radius)
    syy = _box_sum(iy * iy, window_radius)
    sxy = _box_sum(ix * iy, window_radius)
    return sxx, syy, sxy


def harris_scores(gray: jnp.ndarray, k: float = 0.04,
                  window_radius: int = 2) -> jnp.ndarray:
    """Per-pixel Harris response det(M) - k * trace(M)^2 (>=0 clamped)."""
    sxx, syy, sxy = structure_tensor(gray, window_radius)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return jnp.maximum(det - k * tr * tr, 0.0)


def shi_tomasi_scores(gray: jnp.ndarray, window_radius: int = 2
                      ) -> jnp.ndarray:
    """Per-pixel minimum eigenvalue of the structure tensor (GFTT score)."""
    sxx, syy, sxy = structure_tensor(gray, window_radius)
    half_tr = 0.5 * (sxx + syy)
    half_diff = 0.5 * (sxx - syy)
    rad = jnp.sqrt(half_diff * half_diff + sxy * sxy)
    return jnp.maximum(half_tr - rad, 0.0)


def quality_threshold(score: jnp.ndarray, quality: float) -> jnp.ndarray:
    """GFTT semantics: zero scores below quality * max(score)."""
    cut = quality * jnp.max(score)
    return jnp.where(score >= cut, score, 0.0)
