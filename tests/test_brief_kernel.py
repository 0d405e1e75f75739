"""Bit-exactness of the Pallas BRIEF bit-plane kernel (TPU-gated).

ops/brief_kernel.dense_planes_pallas must produce byte-identical uint32
planes to vision/brief.dense_descriptors_shared: same f32 compares of
the same shifted views, reorganized into one launch.  Runs only where a
TPU is attached (the kernel is Mosaic-only); the CPU suite covers the
XLA chain everywhere else.
"""

import os

import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":
    pytest.skip("Pallas BRIEF kernel is TPU-only", allow_module_level=True)

import jax.numpy as jnp

from openekfmonoslam_tpu.ops.brief_kernel import (
    brief_kernel_applicable, dense_planes_pallas)
from openekfmonoslam_tpu.vision import brief

FRAMES_DIR = "/root/reference/experiments/s3/costado_recto1"


def _frame(name):
    from PIL import Image
    return np.asarray(
        Image.open(os.path.join(FRAMES_DIR, name + ".png")).convert("L"))


def test_planes_bit_exact_on_real_frame():
    points, pairs = brief.make_shared_pattern()
    img = _frame("00120").astype(np.float32)
    smoothed = brief.smooth(jnp.asarray(img), 2.0)
    assert brief_kernel_applicable(smoothed, points)
    ref = brief.dense_descriptors_shared(smoothed, points, pairs)
    got = dense_planes_pallas(smoothed, points, pairs)
    assert len(ref) == len(got) == 8
    for w, (r, g) in enumerate(zip(ref, got)):
        assert r.shape == g.shape and r.dtype == g.dtype == jnp.uint32
        assert bool(jnp.all(r == g)), f"word {w} differs"


def test_planes_bit_exact_odd_interior():
    # h - 2*half = 168: divisible by 8 but not 16/32 -- exercises bh=8
    points, pairs = brief.make_shared_pattern()
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, size=(200, 640)).astype(np.float32)
    smoothed = jnp.asarray(img)
    ref = brief.dense_descriptors_shared(smoothed, points, pairs)
    got = dense_planes_pallas(smoothed, points, pairs)
    for r, g in zip(ref, got):
        assert bool(jnp.all(r == g))
