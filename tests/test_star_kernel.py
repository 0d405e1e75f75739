"""ops/star_kernel.py: the fused STAR post-integral scoring kernels.

CPU CI covers the XLA chain (test_star_groundtruth pins it to the
independent CenSurE oracle); the fused kernel needs a TPU, where it was
validated BIT-IDENTICAL to the XLA chain + non_max_suppress on every
interior pixel of a real s3 frame (the _EXT=5 border ring differs by
design -- true extended responses instead of edge replication -- and
sits far inside the >=16 px detector border mask).  Re-run when a TPU
is attached.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas kernel needs a TPU (CPU CI covers the XLA fallback)")

FRAME = "/root/reference/experiments/s3/costado_recto1/00100.png"


def _load():
    from PIL import Image
    return np.asarray(Image.open(FRAME).convert("L"))


def test_fused_star_interior_bit_identical():
    from openekfmonoslam_tpu.ops.star_kernel import star_scores_fused
    from openekfmonoslam_tpu.vision import fast, star

    g = jnp.asarray(_load())
    with jax.default_matmul_precision("default"):
        ref_raw = jax.jit(
            lambda g: star.star_scores(g, 16, 30.0, 10.0))(g)
        ref_nms = jax.jit(lambda g: fast.non_max_suppress(
            star.star_scores(g, 16, 30.0, 10.0), 2))(g)
        raw, nms = jax.jit(
            lambda g: star_scores_fused(g, 16, 30.0, 10.0))(g)
    B = 8  # outside the _EXT ring; production border mask is >= 16
    np.testing.assert_array_equal(np.asarray(ref_raw)[B:-B, B:-B],
                                  np.asarray(raw)[B:-B, B:-B])
    np.testing.assert_array_equal(np.asarray(ref_nms)[B:-B, B:-B],
                                  np.asarray(nms)[B:-B, B:-B])
    assert int((np.asarray(nms)[B:-B, B:-B] > 0).sum()) > 100
