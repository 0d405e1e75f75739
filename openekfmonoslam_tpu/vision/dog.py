"""Scale-space blob detection: DoG (SIFT-analog) and DoH (SURF-analog).

The reference can build cv::SIFT and cv::SURF detectors from config
profiles (FeatureDetectorFactory.cpp:59-124; samples/EKF/config.yml
FeatureDetector.SIFT / .SURF).  The TPU build implements their underlying
response machinery natively:

  * dog_scores -- difference-of-Gaussians extrema over a per-octave scale
    stack with contrast + edge-ratio rejection (SIFT's detection stage,
    nOctaveLayers/contrastThreshold/edgeThreshold/sigma semantics).
  * doh_scores -- scale-normalized determinant-of-Hessian responses from
    box-smoothed second differences (SURF's detection measure).

Everything is whole-image shift-and-add VPU work (separable Gaussian blurs,
static slices); scale search is a static Python loop over a fixed ladder,
so XLA sees straight-line code.  Absolute cv thresholds don't transfer to
these re-derived responses; both detectors therefore also support a
relative `quality` cut (fraction of the frame's max response), and parity
with the reference is at trajectory level (SURVEY.md section 7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.vision.harris import _box_sum, _shift


def _gauss_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur via static padded slices (VPU-only)."""
    if sigma <= 0:
        return img
    kernel = _gauss_kernel(sigma)
    r = len(kernel) // 2
    h, w = img.shape
    pad_v = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for i, kv in enumerate(kernel):
        out = out + float(kv) * jax.lax.slice(pad_v, (i, 0), (i + h, w))
    pad_h = jnp.pad(out, ((0, 0), (r, r)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i, kv in enumerate(kernel):
        out2 = out2 + float(kv) * jax.lax.slice(pad_h, (0, i), (h, i + w))
    return out2


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    return img[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2
                                                 ).mean(axis=(1, 3))


def _upsample_to(img: jnp.ndarray, h: int, w: int, factor: int
                 ) -> jnp.ndarray:
    """Nearest-upsample a level-``l`` map to level-0 shape, CENTER-aligned.

    A coarse pixel (i, j) produced by repeated 2x2 averaging has its
    center at level-0 coordinate (f*i + (f-1)/2): plain repeat leaves the
    block top-left-aligned, so a level-3 detection lands up to 7 px away
    from the corner it scored.  Shifting the upsampled map by (f-1)//2
    puts each block (nearly) over its receptive field.
    """
    if factor > 1:
        img = jnp.repeat(jnp.repeat(img, factor, axis=0), factor, axis=1)
        s = (factor - 1) // 2
        if s:
            img = jnp.pad(img, ((s, 0), (s, 0)))
    return jnp.pad(img, ((0, max(0, h - img.shape[0])),
                         (0, max(0, w - img.shape[1]))))[:h, :w]


def _octave_dog(base: jnp.ndarray, sigma: float, n_layers: int,
                contrast_cut: float, edge_threshold: float) -> jnp.ndarray:
    """Extremum score map for one octave (base image resolution)."""
    k = 2.0 ** (1.0 / n_layers)
    # incremental blurs: level i has absolute sigma = sigma * k^i
    levels = [blur(base, sigma)]
    for i in range(1, n_layers + 3):
        prev_s = sigma * k ** (i - 1)
        inc = prev_s * np.sqrt(k * k - 1.0)
        levels.append(blur(levels[-1], float(inc)))
    dogs = [levels[i + 1] - levels[i] for i in range(n_layers + 2)]

    er = (edge_threshold + 1.0) ** 2 / edge_threshold
    score = jnp.zeros_like(base)
    for i in range(1, n_layers + 1):
        d = dogs[i]
        # 26-neighborhood extremum (3x3 in-plane on all 3 DoG layers)
        neigh_max = jnp.full_like(d, -jnp.inf)
        neigh_min = jnp.full_like(d, jnp.inf)
        for layer in (dogs[i - 1], d, dogs[i + 1]):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    s = _shift(layer, dy, dx)
                    neigh_max = jnp.maximum(neigh_max, s)
                    neigh_min = jnp.minimum(neigh_min, s)
        # the center participates in its own neighborhood; an extremum
        # equals the neighborhood max (or min)
        is_ext = (d >= neigh_max) | (d <= neigh_min)
        # edge rejection: spatial Hessian ratio (SIFT tr^2/det test)
        dxx = _shift(d, 0, 1) + _shift(d, 0, -1) - 2.0 * d
        dyy = _shift(d, 1, 0) + _shift(d, -1, 0) - 2.0 * d
        dxy = 0.25 * (_shift(d, 1, 1) + _shift(d, -1, -1)
                      - _shift(d, 1, -1) - _shift(d, -1, 1))
        det = dxx * dyy - dxy * dxy
        tr = dxx + dyy
        not_edge = (det > 0) & (tr * tr < er * det)
        ok = is_ext & not_edge & (jnp.abs(d) >= contrast_cut)
        score = jnp.maximum(score, jnp.where(ok, jnp.abs(d), 0.0))
    return score


def dog_scores(gray: jnp.ndarray, sigma: float = 1.6, n_layers: int = 3,
               contrast_threshold: float = 0.04,
               edge_threshold: float = 10.0, n_octaves: int = 2,
               quality: float = 0.0) -> jnp.ndarray:
    """SIFT-analog detection score map at full resolution.

    `contrast_threshold` follows SIFT's [0,1]-intensity convention; the
    prefilter cut is 0.5 * t / n_layers as in the original.
    """
    img = gray.astype(jnp.float32) / 255.0
    cut = 0.5 * contrast_threshold / n_layers
    h, w = img.shape
    base = img
    score = jnp.zeros((h, w), jnp.float32)
    for o in range(n_octaves):
        s = _octave_dog(base, sigma, n_layers, cut, edge_threshold)
        score = jnp.maximum(score, _upsample_to(s, h, w, 2 ** o))
        base = _downsample2(base)
    if quality > 0:
        score = jnp.where(score >= quality * jnp.max(score), score, 0.0)
    return score


def doh_scores(gray: jnp.ndarray, sizes=(2, 4, 8),
               quality: float = 0.05) -> jnp.ndarray:
    """SURF-analog: scale-normalized determinant-of-Hessian score map.

    Second differences at spacing s on a box-smoothed image approximate
    SURF's box-filter Hessian; the 0.9 factor on Dxy follows the SURF
    paper's box-approximation correction.  Responses are normalized by s^2
    per derivative (s^4 for the determinant) so scales compete fairly; the
    cut is relative (`quality` fraction of the max) because cv::SURF's
    absolute hessianThreshold does not transfer to this response.
    """
    img = gray.astype(jnp.float32) / 255.0
    score = jnp.zeros_like(img)
    for s in sizes:
        sm = _box_sum(img, s) / float((2 * s + 1) ** 2)
        dxx = _shift(sm, 0, s) + _shift(sm, 0, -s) - 2.0 * sm
        dyy = _shift(sm, s, 0) + _shift(sm, -s, 0) - 2.0 * sm
        dxy = 0.25 * (_shift(sm, s, s) + _shift(sm, -s, -s)
                      - _shift(sm, s, -s) - _shift(sm, -s, s))
        det = (dxx * dyy - (0.9 * dxy) ** 2) / float(s) ** 4 * 1e6
        score = jnp.maximum(score, jnp.maximum(det, 0.0))
    if quality > 0:
        score = jnp.where(score >= quality * jnp.max(score), score, 0.0)
    return score
