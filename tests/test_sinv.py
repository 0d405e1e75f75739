"""ops/sinv.py: the SPD-inverse used by the joint updates.

The CPU suite exercises the Cholesky fallback (every engine test goes
through spd_inverse); the Pallas Newton-Schulz kernel itself needs a TPU
and is validated here when one is attached (bench/verify environments),
plus by the TPU bench runs' golden trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.ops.sinv import spd_inverse, sinv_pallas


def _spd(m, cond, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    s = (q * np.geomspace(1.0, cond, m)) @ q.T
    return ((s + s.T) / 2).astype(np.float32)


def test_fallback_matches_numpy():
    s = _spd(96, 1e3)
    x = np.asarray(spd_inverse(jnp.asarray(s)))
    want = np.linalg.inv(s.astype(np.float64))
    rel = np.abs(x - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas kernel needs a TPU")
@pytest.mark.parametrize("cond", [1e2, 1e3, 1e4])
def test_pallas_newton_schulz_accuracy(cond):
    """Accuracy across the realistic conditioning range: the update's S
    has lambda_min >= min(pixelError, 1) (r_diag floor) and measured
    cond ~ 1e2 on the bundled runs; 1e4 is the safety margin."""
    s = _spd(192, cond)
    x = np.asarray(sinv_pallas(jnp.asarray(s), lam_floor=1.0))
    want = np.linalg.inv(s.astype(np.float64))
    rel = np.abs(x - want).max() / np.abs(want).max()
    # Cholesky-solve lands at ~cond * eps_f32 too
    assert rel < 3e-5 * max(cond / 1e2, 1.0), (cond, rel)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas kernel needs a TPU")
def test_pallas_handles_masked_identity_rows():
    """The update's S has identity rows for unmatched slots -- the exact
    shape the kernel sees in production."""
    rng = np.random.default_rng(1)
    F2 = 192
    used = rng.random(F2) < 0.6
    h = rng.normal(size=(F2, 30)) * 3.0
    s = np.zeros((F2, F2), np.float32)
    su = (h @ h.T)[np.ix_(used, used)]
    s[np.ix_(used, used)] = su
    s[np.diag_indices(F2)] += np.where(used, 1.0, 1.0)
    x = np.asarray(sinv_pallas(jnp.asarray(s), lam_floor=1.0))
    want = np.linalg.inv(s.astype(np.float64))
    rel = np.abs(x - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel
