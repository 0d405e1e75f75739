"""ops/cholsolve.py: fused Pallas SPD solve, algorithm-level checks.

The kernel is not wired into the engine (see its STATUS docstring: XLA's
solve is currently faster on v5e); these tests pin the ALGORITHM in
interpret mode so the experiment stays alive and correct for the
Newton-Schulz redesign.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.scipy.linalg import cho_factor, cho_solve

from openekfmonoslam_tpu.ops.cholsolve import BS, chol_solve_pallas, solve_spd


def _spd(rng, m, scale=10.0):
    A = rng.normal(size=(m, m)).astype(np.float32)
    return jnp.asarray(A @ A.T + scale * np.eye(m, dtype=np.float32))


@pytest.mark.parametrize("m,n", [(64, 128), (192, 640), (128, 256)])
def test_kernel_matches_cho_solve(m, n):
    rng = np.random.default_rng(0)
    S = _spd(rng, m)
    B = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    X = chol_solve_pallas(S, B, interpret=True)
    Xref = cho_solve(cho_factor(S, lower=True), B)
    err = float(jnp.max(jnp.abs(X - Xref)) / jnp.max(jnp.abs(Xref)))
    assert err < 1e-4, err


def test_solve_spd_pads_odd_sizes():
    rng = np.random.default_rng(1)
    S = _spd(rng, 48, scale=5.0)
    B = jnp.asarray(rng.normal(size=(48, 200)).astype(np.float32))
    # identity-padding correctness is checked through the public wrapper
    # with the fallback path (the pallas call needs a TPU); the padding
    # helper itself is exercised by padding manually + interpret kernel
    Mp = ((48 + BS - 1) // BS) * BS
    Sp = jnp.pad(S, ((0, Mp - 48), (0, Mp - 48)))
    Sp = Sp.at[48:, 48:].set(jnp.eye(Mp - 48, dtype=Sp.dtype))
    Bp = jnp.pad(B, ((0, Mp - 48), (0, 56)))
    X = chol_solve_pallas(Sp, Bp, interpret=True)[:48, :200]
    Xref = cho_solve(cho_factor(S, lower=True), B)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xref),
                               rtol=2e-3, atol=2e-4)
    # the wrapper's fallback equals cho_solve exactly off-TPU
    Xw = solve_spd(S, B)
    np.testing.assert_allclose(np.asarray(Xw), np.asarray(Xref),
                               rtol=0, atol=0)
