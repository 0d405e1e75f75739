"""BRIEF-256 binary descriptors: smoothed point-pair tests, bit-packed.

The reference extracts 32-byte BRIEF descriptors through OpenCV
(DescriptorExtractorFactory.cpp:51-134) and matches them with a popcount
Hamming distance (Matching.cpp:74-90, popCountTable EKFMath.h:48-58).

The TPU build keeps the same descriptor *shape* (256 bits packed in 8
uint32 words, Hamming matching) but generates its own fixed point-pair
pattern (isotropic Gaussian, seeded), since descriptors only ever compete
against other descriptors from this same extractor.  Extraction is K
keypoints x 256 pairs x 2 gathers from the Gaussian-smoothed image -- one
vectorized gather, no loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_pattern(n_bits: int = 256, patch_size: int = 33, seed: int = 7
                 ) -> np.ndarray:
    """(n_bits, 4) int32 array of (dy1, dx1, dy2, dx2) offsets.

    Classic BRIEF GII sampling: both points i.i.d. N(0, (S/5)^2), clipped
    to the patch.
    """
    rng = np.random.default_rng(seed)
    half = patch_size // 2
    sigma = patch_size / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 4))
    return np.clip(np.round(pts), -half, half).astype(np.int32)


def make_shared_pattern(n_bits: int = 256, patch_size: int = 33,
                        seed: int = 7, n_points: int = 64
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Shared-point BRIEF pattern: (points (P, 2), pairs (n_bits, 2)).

    Instead of 2*n_bits independent sample locations, draw ``n_points``
    distinct offsets and build the n_bits comparisons as pairs among them
    (the BRISK/FREAK sampling-pool design -- BRISK uses 60 points, FREAK
    43, for 512 pairs).  The dense extraction then needs P shifted image
    views instead of 2*n_bits: 8x fewer shifted loads, which is exactly
    what bounds dense_descriptors on TPU (see its perf note).
    """
    rng = np.random.default_rng(seed)
    half = patch_size // 2
    sigma = patch_size / 5.0
    pts = set()
    while len(pts) < n_points:
        p = np.clip(np.round(rng.normal(0.0, sigma, size=2)), -half, half)
        pts.add((int(p[0]), int(p[1])))
    points = np.asarray(sorted(pts), dtype=np.int32)        # (P, 2) dy, dx
    pairs = set()
    while len(pairs) < n_bits:
        i, j = rng.integers(0, n_points, size=2)
        if i != j and (i, j) not in pairs and (j, i) not in pairs:
            pairs.add((int(i), int(j)))
    return points, np.asarray(sorted(pairs), dtype=np.int32)


def gaussian_kernel(sigma: float, radius: int = 4) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def smooth(gray: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur (the reference's BRIEF smooths with a box
    filter; a small Gaussian serves the same noise-robustness purpose).

    Implemented as shift-and-add over static padded slices: XLA lowers a
    single-channel 9-tap conv on TPU to a pathological MXU layout (~5 ms
    for a 480x640 frame); the 18 fused VPU multiply-adds here cost ~50 us.
    """
    kernel = gaussian_kernel(sigma)
    r = len(kernel) // 2
    img = gray.astype(jnp.float32)
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


@partial(jax.jit, static_argnames=())
def extract(smoothed: jnp.ndarray, yx: jnp.ndarray, pattern: jnp.ndarray
            ) -> jnp.ndarray:
    """Descriptors for K keypoints: (K, n_bits/32) uint32.

    ``smoothed``: (H, W) float32; ``yx``: (K, 2) int32; ``pattern``:
    (n_bits, 4) int32.  Coordinates are clipped to the image so border
    keypoints produce defined (if less distinctive) descriptors; detection
    masks should exclude the border anyway.
    """
    h, w = smoothed.shape
    y = yx[:, 0:1]                                   # (K, 1)
    x = yx[:, 1:2]
    y1 = jnp.clip(y + pattern[None, :, 0], 0, h - 1)  # (K, B)
    x1 = jnp.clip(x + pattern[None, :, 1], 0, w - 1)
    y2 = jnp.clip(y + pattern[None, :, 2], 0, h - 1)
    x2 = jnp.clip(x + pattern[None, :, 3], 0, w - 1)
    bits = smoothed[y1, x1] < smoothed[y2, x2]       # (K, B) bool
    k, b = bits.shape
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(
        bits.reshape(k, b // 32, 32).astype(jnp.uint32) * weights[None, None],
        axis=-1, dtype=jnp.uint32)
    return words                                      # (K, B/32)


def dense_descriptors(smoothed: jnp.ndarray, pattern) -> jnp.ndarray:
    """Whole-image descriptors: (W8, H, W) uint32 bit-planes.

    Each of the 256 point-pair tests is a *static-slice* comparison of two
    shifted copies of the padded image (the pattern is a compile-time
    constant), so the per-keypoint extraction becomes an 8-word gather
    instead of 512 scalar gathers -- the layout TPU wants.  One dense pass
    serves both the matching keypoints and the new-feature keypoints.

    Perf note (v5e, measured): ~0.73 ms/frame at 480x640, bound by the
    misaligned vector loads of the 512 shifted views, NOT by HBM traffic
    or accumulator read-modify-writes -- uint8 sources, int16 fixed-point
    sources, and byte-wise accumulators all measure within 7% of f32.  A
    Pallas kernel holding the frame in VMEM (static-slice comparisons over
    pre-staged row tiles with halos) compiled but lowered those same
    shifted reads to per-op sublane/lane rotations and ran 1.6x SLOWER
    (1.17 ms), with a Mosaic miscompare on the packed planes to boot.
    The dy-plane variant (33 pre-shifted row planes so the kernel needs
    only lane slices) was also tried: identical 1.16 ms and the same
    miscompare -- the ~1 ms is Mosaic's floor for 512 independent
    slice-compare ops regardless of alignment.  Do not re-attempt in this
    op shape.
    """
    import numpy as np_
    pattern = np_.asarray(pattern)
    h, w = smoothed.shape
    half = int(np_.abs(pattern).max())
    padded = jnp.pad(smoothed, half, mode="edge")

    def shifted(dy, dx):
        return jax.lax.slice(padded, (half + dy, half + dx),
                             (half + dy + h, half + dx + w))

    n_bits = pattern.shape[0]
    words = []
    for wstart in range(0, n_bits, 32):
        acc = jnp.zeros((h, w), jnp.uint32)
        for j in range(32):
            b = wstart + j
            dy1, dx1, dy2, dx2 = (int(pattern[b, 0]), int(pattern[b, 1]),
                                  int(pattern[b, 2]), int(pattern[b, 3]))
            bit = shifted(dy1, dx1) < shifted(dy2, dx2)
            acc = acc | (bit.astype(jnp.uint32) << j)
        words.append(acc)
    return jnp.stack(words)                       # (W8, H, W)


def dense_descriptors_shared(smoothed: jnp.ndarray, points, pairs
                             ) -> jnp.ndarray:
    """Whole-image shared-point descriptors: (W8, H, W) uint32 bit-planes.

    Same output contract as dense_descriptors, built from a
    make_shared_pattern pool: only P (=64) shifted views of the padded
    image are materialized, and the n_bits comparisons index into them.
    The shifted loads -- not the compares -- bound this op on TPU, so the
    8x reduction in distinct views is the win.
    """
    import numpy as np_
    points = np_.asarray(points)
    pairs = np_.asarray(pairs)
    h, w = smoothed.shape
    half = int(np_.abs(points).max())

    # Planes cover only the interior (h-2*half, w-2*half): keypoints are
    # border-masked at >= half+1 px anyway (Frontend.border), so the halo
    # values were never consumed -- and the jnp.pad halo this used to
    # build cost a catastrophic relayout under vmap (two ~900 us "output
    # fusions" per batched frame at B=8).  Interior views are pure static
    # slices of the unpadded image.  lookup_descriptors offsets by
    # ``half``.
    ih, iw = h - 2 * half, w - 2 * half
    views = [jax.lax.slice(smoothed, (half + int(dy), half + int(dx)),
                           (half + int(dy) + ih, half + int(dx) + iw))
             for dy, dx in points]

    n_bits = pairs.shape[0]
    words = []
    for wstart in range(0, n_bits, 32):
        acc = jnp.zeros((ih, iw), jnp.uint32)
        for j in range(32):
            i1, i2 = int(pairs[wstart + j, 0]), int(pairs[wstart + j, 1])
            bit = views[i1] < views[i2]
            acc = acc | (bit.astype(jnp.uint32) << j)
        words.append(acc)
    # a tuple, NOT jnp.stack: stacking along a new minor axis of 8 pads
    # every (8,128) tile 16x (measured 5x SLOWDOWN when tried for
    # coalesced lookups), and a leading-axis stack costs a ~30 us
    # concatenate; the per-word lookups gather from each plane directly
    return tuple(words)                           # W8 x (ih, iw)


def extract_shared(smoothed: jnp.ndarray, yx: jnp.ndarray, points,
                   pairs) -> jnp.ndarray:
    """Sparse shared-point extraction at K keypoints: (K, n_bits/32).

    Bit-exact with dense_descriptors_shared + lookup_descriptors away from
    the image border (the dense path pads edge-replicated, this one clips
    sample coordinates -- same values).
    """
    h, w = smoothed.shape
    pts = jnp.asarray(points)
    y = jnp.clip(yx[:, 0:1] + pts[None, :, 0], 0, h - 1)   # (K, P)
    x = jnp.clip(yx[:, 1:2] + pts[None, :, 1], 0, w - 1)
    vals = smoothed[y, x]                                   # (K, P)
    pr = jnp.asarray(pairs)
    bits = vals[:, pr[:, 0]] < vals[:, pr[:, 1]]            # (K, B)
    k, b = bits.shape
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(
        bits.reshape(k, b // 32, 32).astype(jnp.uint32) * weights[None, None],
        axis=-1, dtype=jnp.uint32)


def lookup_descriptors(planes, yx: jnp.ndarray,
                       margin: int = 0) -> jnp.ndarray:
    """W8-tuple of interior planes + (K, 2) keypoints -> (K, W8) packed
    descriptors (one small gather per word plane).

    ``margin`` is the interior crop of dense_descriptors_shared (= the
    pattern half-width); engine keypoints are border-masked beyond it, so
    the clip below never actually alters a consumed coordinate."""
    if isinstance(planes, (tuple, list)):
        ih, iw = planes[0].shape
        y = jnp.clip(yx[:, 0] - margin, 0, ih - 1)
        x = jnp.clip(yx[:, 1] - margin, 0, iw - 1)
        return jnp.stack([p[y, x] for p in planes], axis=-1)
    return planes[:, yx[:, 0], yx[:, 1]].T


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(F, W) x (K, W) packed descriptors -> (F, K) int32 Hamming distances
    (the reference's popcount loop, Matching.cpp:74-90, as one vectorized
    XOR + population_count)."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
