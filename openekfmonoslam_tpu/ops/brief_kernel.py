"""Dense BRIEF bit-planes as ONE Pallas VPU kernel.

The BRIEF descriptor plane pass is the single largest item in the frame
budget (~131 us/frame of the ~0.59 ms round-5 frame): 8 XLA fusions,
each materializing 32 comparisons of shifted image views and packing
them into a uint32 plane (vision/brief.dense_descriptors_shared).  The
math is irreducibly VPU compare work -- measured dtype-insensitive in
round 3 -- but the XLA lowering pays ~4 vector ops per bit (compare,
convert, shift, or) plus a re-materialized pair of shifted views per
comparison, with an HBM round-trip between word fusions.

This kernel computes all 8 word planes in one launch, gridded over row
blocks with the whole smoothed image resident in VMEM:

  * each of the 64 shared sample points' shifted views is materialized
    ONCE per block (explicit Python-level CSE; 512 view uses -> 64
    vector loads),
  * each bit is one compare + one convert-shift-or chain on registered
    views,
  * the 8 planes leave VMEM exactly once.

Bit-exact with the XLA chain by construction: identical f32 compares of
identical shifted views (tests/test_brief_kernel.py locks this on real
frames, TPU-gated).

Reference being out-designed: the per-keypoint BRIEF extraction loop of
DescriptorExtractorFactory.cpp's cv::BriefDescriptorExtractor (the
reference extracts at keypoints on the CPU; the TPU design computes
dense planes + gathers, see vision/brief.py's perf notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _brief_kernel(in_ref, *out_refs, points, pairs, half, bh, iw):
    # ONE aligned dynamic load of the extended row band per grid step
    # (base is a multiple of 8 because bh is -- Mosaic requires provably
    # sublane-aligned dynamic starts); each shifted view is then TWO
    # pltpu.roll rotations of that value plus a zero-offset slice.
    #
    # WHY rolls and not slices: every slice-based formulation of the
    # views -- per-view dynamic loads, arbitrary-offset static slices of
    # the band, even row-residue-shared copies -- MISCOMPILED under
    # Mosaic whenever a plane mixed >= 4 distinct views: specific views
    # came out garbage while every view was bit-exact in isolation (and
    # in interpret=True mode).  The pltpu.roll lowering is exact for the
    # full 256-bit pattern; the rolled-in wrap rows/cols land beyond the
    # (bh, iw) slice and are never consumed.
    base = pl.program_id(0) * bh
    eh = bh + 2 * half
    ext = in_ref[pl.dslice(base, eh), :]
    ew = ext.shape[1]
    views: dict = {}

    def view(p: int):
        if p not in views:
            dy, dx = int(points[p, 0]), int(points[p, 1])
            r = pltpu.roll(ext, eh - (half + dy), 0)
            r = pltpu.roll(r, ew - (half + dx), 1)
            views[p] = jax.lax.slice(r, (0, 0), (bh, iw))
        return views[p]

    for w8, out_ref in enumerate(out_refs):
        acc = jnp.zeros((bh, iw), jnp.uint32)
        for j in range(32):
            i1 = int(pairs[w8 * 32 + j, 0])
            i2 = int(pairs[w8 * 32 + j, 1])
            bit = view(i1) < view(i2)
            acc = acc | (bit.astype(jnp.uint32) << j)
        out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("points_t", "pairs_t"))
def _dense_planes_jit(smoothed: jnp.ndarray, points_t, pairs_t):
    points = np.asarray(points_t, np.int32)
    pairs = np.asarray(pairs_t, np.int32)
    h, w = smoothed.shape
    half = int(np.abs(points).max())
    ih, iw = h - 2 * half, w - 2 * half
    # row-block height: largest power-of-two divisor of ih in [8, 32]
    # (sublane-aligned so the in-kernel dynamic row base is provably a
    # multiple of 8; 64 live views of ~bh*iw*4 B each)
    bh = 8
    while bh < 32 and ih % (bh * 2) == 0:
        bh *= 2
    n_words = pairs.shape[0] // 32
    kern = functools.partial(_brief_kernel, points=points, pairs=pairs,
                             half=half, bh=bh, iw=iw)
    outs = pl.pallas_call(
        kern,
        grid=(ih // bh,),
        in_specs=[pl.BlockSpec((h, w), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((bh, iw), lambda i: (i, 0))
                        for _ in range(n_words)),
        out_shape=tuple(jax.ShapeDtypeStruct((ih, iw), jnp.uint32)
                        for _ in range(n_words)),
    )(smoothed)
    return tuple(outs)


def dense_planes_pallas(smoothed: jnp.ndarray, points, pairs):
    """W8-tuple of (ih, iw) uint32 planes; drop-in for
    brief.dense_descriptors_shared on TPU float32."""
    points = np.asarray(points)
    pairs = np.asarray(pairs)
    return _dense_planes_jit(smoothed,
                             tuple(map(tuple, points.tolist())),
                             tuple(map(tuple, pairs.tolist())))


def brief_kernel_applicable(smoothed: jnp.ndarray, points) -> bool:
    h, w = smoothed.shape
    half = int(np.abs(np.asarray(points)).max())
    ih = h - 2 * half
    # the whole image + 64 block views must fit VMEM; any ih works (bh
    # falls back to 1) but reject degenerate interiors
    return (jax.default_backend() == "tpu"
            and smoothed.dtype == jnp.float32
            and ih >= 8 and ih % 8 == 0
            and h * w * 4 <= 4 * 1024 * 1024)
