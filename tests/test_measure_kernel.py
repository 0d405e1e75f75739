"""ops/measure_kernel.py: the one-kernel Pallas measurement chain.

The CI suite runs on CPU where predict_measurements falls back to the
XLA chain (every engine test covers that path); the kernel itself needs
a TPU and was validated there at BIT-EXACT agreement with the XLA chain
(uv, Hc, Hf, visibility; quirks on and off) -- re-run these when a TPU
is attached.  The golden trajectory and the TPU bench drive it
end-to-end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter import measure_fast

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas kernel needs a TPU (CPU CI covers the XLA fallback)")


def _scene(rng, F=96):
    feats = np.zeros((F, 6), np.float32)
    feats[:, 3] = rng.normal(0, 0.3, F)
    feats[:, 4] = rng.normal(0, 0.2, F)
    feats[:, 5] = np.abs(rng.normal(1.0, 0.3, F)) + 0.2
    feats[:, 0:3] = rng.normal(0, 0.05, (F, 3)).astype(np.float32)
    is_xyz = rng.random(F) < 0.3
    for i in np.nonzero(is_xyz)[0]:
        th, ph, rho = feats[i, 3], feats[i, 4], feats[i, 5]
        m = np.array([np.cos(ph) * np.sin(th), -np.sin(ph),
                      np.cos(ph) * np.cos(th)])
        feats[i, 0:3] += m / rho
        feats[i, 3:] = 0
    active = rng.random(F) < 0.9
    q = np.array([1.0, 0.02, -0.03, 0.01], np.float32)
    q /= np.linalg.norm(q)
    cam7 = np.concatenate([rng.normal(0, 0.02, 3).astype(np.float32), q])
    return feats, is_xyz, active, cam7


@pytest.mark.parametrize("quirks", [False, True])
def test_kernel_bit_exact_with_xla_chain(quirks):
    from openekfmonoslam_tpu.ops.measure_kernel import measure_chain_pallas

    cfg = SlamConfig()
    cam = Camera.from_calibration(cfg.camera, jnp.float32)
    feats, is_xyz, active, cam7 = _scene(np.random.default_rng(1))

    uv1, Hc1, Hf1 = measure_fast.measurements_with_jacobians(
        cam, jnp.asarray(cam7), jnp.asarray(feats), jnp.asarray(is_xyz),
        quirks=quirks)
    vis1 = measure_fast.visibility(
        cam, jnp.asarray(cam7), jnp.asarray(feats), jnp.asarray(is_xyz),
        jnp.asarray(active), uv1)
    uv2, Hc2, Hf2, vis2 = measure_chain_pallas(
        cam, jnp.asarray(cam7), jnp.asarray(feats), jnp.asarray(is_xyz),
        jnp.asarray(active), quirks=quirks)

    np.testing.assert_array_equal(np.asarray(vis1), np.asarray(vis2))
    m = np.asarray(vis1)
    # measured bit-exact on v5e; allow f32-roundoff headroom for future
    # Mosaic scheduling changes
    for a, b in ((uv1, uv2), (Hc1, Hc2), (Hf1, Hf2)):
        a, b = np.asarray(a)[m], np.asarray(b)[m]
        np.testing.assert_allclose(b, a, rtol=1e-6,
                                   atol=1e-6 * max(np.abs(a).max(), 1.0))
