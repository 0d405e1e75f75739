"""STAR (CenSurE) post-integral scoring as TWO Pallas VPU kernels.

vision/star.py's post-integral chain -- 8 scale responses assembled
from 4 integral-image slices each, the scale max, the structure-tensor
line test, the response threshold -- plus the caller's 5x5 non-max
suppression compile under XLA to ~25 whole-frame fusions with HBM
round-trips between them (~50 us/frame: star.py + harris.py +
fast.non_max_suppress, per-source-line trace attribution).  Here the
whole post-integral pipeline runs in VMEM as two kernels:

  kernel 1: integral image -> scale-max |center-surround| response,
      computed on an E=5-extended grid so kernel 2's stencils never
      need edge padding;
  kernel 2: extended response -> gradients -> structure tensor (5x5
      box sums as separable static-slice adds) -> line gate ->
      threshold -> the pre-NMS map AND the 5x5-NMS'd map (separable
      max), one launch.

Interior pixels are arithmetically identical to the XLA chain (same
operations, same summation order); within 5 px of the image border the
kernel sees true extended responses where the XLA chain edge-replicates
-- those pixels sit far inside the detector border mask (>= 16 px for
the production BRIEF patch), so detection behavior is unchanged.
Equivalence is locked by tests/test_star_kernel.py (TPU-gated).

Reference being re-designed: cv::StarDetector's response + line
suppression (FeatureDetectorFactory.cpp:135-158 parameters; see
vision/star.py for the box-CenSurE design notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openekfmonoslam_tpu.vision.star import _integral, star_sizes

_EXT = 5          # extension: 1 (gradient) + 2 (box sum) + 2 (NMS)


def _resp_kernel(ii_ref, best_ref, *, sizes, pad, he, we):
    """Scale-max |inner mean - outer mean| on the (he, we) extended grid.

    ``ii_ref`` is the standard pad-width integral image edge-padded by
    _EXT (caller): interior responses are computed from the exact same
    integral values as the XLA chain (bit-identical), and the _EXT ring
    of beyond-border responses only feeds the border stencils."""
    def box_mean(n):
        top = pad - n
        bot = pad + n + 1
        s = (ii_ref[bot:bot + he, bot:bot + we]
             - ii_ref[top:top + he, bot:bot + we]
             - ii_ref[bot:bot + he, top:top + we]
             + ii_ref[top:top + he, top:top + we])
        return s * (1.0 / float((2 * n + 1) ** 2))

    # accumulate through the ref: value-chained maxima kept ~16 slice
    # temporaries live at once and overflowed the 16 MB VMEM stack
    best_ref[:] = jnp.zeros((he, we), jnp.float32)
    for n in sizes:
        best_ref[:] = jnp.maximum(
            best_ref[:], jnp.abs(box_mean(n) - box_mean(2 * n)))


def _score_kernel(best_ref, raw_ref, nms_ref, rx_ref, ry_ref, sxx_ref,
                  syy_ref, sxy_ref, *, h, w,
                  line_threshold: float, response_threshold: float):
    """Line test + threshold + 5x5 NMS from the extended response map.

    Every (frame-sized) intermediate lives in an explicit scratch ref:
    the value-chained form kept ~15 maps live at once and overflowed
    the 16 MB VMEM stack."""
    hg = h + 2 * _EXT - 2
    wg = w + 2 * _EXT - 2
    h4, w4 = h + 4, w + 4
    # central-difference gradients on the (h+8, w+8) interior
    rx_ref[:] = 0.5 * (best_ref[1:1 + hg, 2:2 + wg]
                       - best_ref[1:1 + hg, 0:wg])
    ry_ref[:] = 0.5 * (best_ref[2:2 + hg, 1:1 + wg]
                       - best_ref[0:hg, 1:1 + wg])

    def box5_into(out_ref, prod):
        # separable 5x5 box sum, valid region (rows then cols, ascending
        # -- the same summation order as harris._box_sum)
        acc = prod[0:hg - 4, :]
        for d in range(1, 5):
            acc = acc + prod[d:d + hg - 4, :]
        out = acc[:, 0:wg - 4]
        for d in range(1, 5):
            out = out + acc[:, d:d + wg - 4]
        out_ref[:] = out

    box5_into(sxx_ref, rx_ref[:] * rx_ref[:])           # (h+4, w+4)
    box5_into(syy_ref, ry_ref[:] * ry_ref[:])
    box5_into(sxy_ref, rx_ref[:] * ry_ref[:])
    sxy = sxy_ref[:]
    det = sxx_ref[:] * syy_ref[:] - sxy * sxy
    tr = sxx_ref[:] + syy_ref[:]
    not_line = (det > 0) & (tr * tr < line_threshold * det)

    center = best_ref[3:3 + h4, 3:3 + w4]
    s4 = jnp.where(not_line, center, 0.0)
    # s4 reuses sxx's scratch (sxx is dead once not_line is computed)
    s4_ref = sxx_ref
    s4_ref[:] = jnp.where(s4 >= response_threshold, s4, 0.0)  # (h+4, w+4)
    raw_ref[:] = s4_ref[2:2 + h, 2:2 + w]

    # 5x5 max pool (separable), then keep local maxima
    rowm = s4_ref[0:h, :]
    for d in range(1, 5):
        rowm = jnp.maximum(rowm, s4_ref[d:d + h, :])
    pooled = rowm[:, 0:w]
    for d in range(1, 5):
        pooled = jnp.maximum(pooled, rowm[:, d:d + w])
    nms_ref[:] = jnp.where((raw_ref[:] >= pooled) & (raw_ref[:] > 0),
                           raw_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("max_size",
                                             "response_threshold",
                                             "line_threshold"))
def star_scores_fused(gray: jnp.ndarray, max_size: int = 16,
                      response_threshold: float = 30.0,
                      line_threshold: float = 10.0):
    """(score_raw, score_nms) -- vision/star.star_scores plus the 5x5
    non-max suppression, fused post-integral.  The integral image itself
    stays an XLA MXU prefix-sum matmul (already one fusion)."""
    h, w = gray.shape
    sizes = star_sizes(max_size)
    pad = 2 * max(sizes) + 1
    # the SAME integral as vision/star.star_scores (same pad, same mean
    # centering -> interior scores bit-identical), edge-padded by the
    # extension so every kernel slice start is non-negative
    ii = jnp.pad(_integral(gray, pad), _EXT, mode="edge")
    he, we = h + 2 * _EXT, w + 2 * _EXT

    best = pl.pallas_call(
        functools.partial(_resp_kernel, sizes=sizes, pad=pad, he=he,
                          we=we),
        out_shape=jax.ShapeDtypeStruct((he, we), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ii)

    hg, wg = he - 2, we - 2
    raw, nms = pl.pallas_call(
        functools.partial(_score_kernel, h=h, w=w,
                          line_threshold=float(line_threshold),
                          response_threshold=float(response_threshold)),
        out_shape=(jax.ShapeDtypeStruct((h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h, w), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((hg, wg), jnp.float32),
                        pltpu.VMEM((hg, wg), jnp.float32),
                        pltpu.VMEM((h + 4, w + 4), jnp.float32),
                        pltpu.VMEM((h + 4, w + 4), jnp.float32),
                        pltpu.VMEM((h + 4, w + 4), jnp.float32)],
    )(best)
    return raw, nms


def star_kernel_applicable(h: int, w: int, max_size: int) -> bool:
    # VMEM bound: kernel 2 holds ~8 (h+10, w+10) f32 maps live
    return (jax.default_backend() == "tpu" and h * w <= 640 * 1024
            and max_size <= 32)
