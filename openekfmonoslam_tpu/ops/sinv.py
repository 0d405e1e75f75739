"""SPD matrix inverse as ONE Pallas MXU kernel (scaled Newton-Schulz).

The joint update needs S^-1 for K^T = S^-1 (H P) (Update.cpp:92-109 --
the reference explicitly inverts S).  XLA lowers cho_factor + cho_solve
to four custom calls (blocked Cholesky panels + triangular solves)
measuring ~104 us/frame across the LI+HI updates at 2F=192 -- sequential
panel algorithms on shapes far too small for them.  This kernel runs the
quadratically-convergent Newton-Schulz iteration

    X_{k+1} = X_k (2 I - S X_k),        X_0 = 2 / (1 + ||S||_inf) * I

entirely on the MXU in one launch.  Why this works here:

  * The update's S = H P H^T + diag(r) with r >= min(pixelError, 1), so
    lambda_min(S) >= lambda_floor is KNOWN a priori; with the scaled
    identity init the eigenvalues of S X_0 lie in (2 lambda_floor /
    (lambda_floor + ||S||_inf), 2), and |1 - lambda| contracts
    quadratically from ~(1 - 2/cond).  Measured cond(S) on the bundled
    runs is ~1e2 (the r floor); N_ITERS covers cond through ~1e4.
  * Iteration matmuls run at 3-pass bf16 (Precision.HIGH, ~f32
    products): single-pass bf16 was measured to DESTROY convergence --
    rounding S to bf16 perturbs its spectrum by ~0.8% of lambda_max,
    which drives the unit-scale eigenvalues of a cond ~ 1e2-1e4 S
    negative and Newton-Schulz diverges outside (0, 2).  The final
    F32_POLISH steps run 6-pass (HIGHEST); converged iterates are fixed
    points and each polish step squares the residual, landing at the
    ~cond * eps f32 floor -- the same class as Cholesky-solve.

`spd_inverse` picks this kernel on TPU float32 and falls back to
Cholesky-against-I elsewhere (CPU tests, float64 parity replays).
Accuracy + equivalence are locked by tests/test_sinv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

N_ITERS = 18          # total; covers cond(S) ~ 1e4 with margin
F32_POLISH = 3        # final full-f32 iterations
_LANE = 128


def _pad_to_tile(m: int) -> int:
    return ((m + _LANE - 1) // _LANE) * _LANE


def _sinv_kernel(s_ref, out_ref, x_ref, lam_floor: float, n_iters: int,
                 f32_polish: int):
    S = s_ref[:]
    m = S.shape[0]
    ninf = jnp.max(jnp.sum(jnp.abs(S), axis=1))
    # 1.8 (not the optimal 2.0): the optimal scale puts lambda_max(S X0)
    # at 2 - O(1/cond), and bf16 product noise (~1e-2 relative) across
    # the divergence boundary lambda = 2; the 10% margin costs ~1 extra
    # iteration and makes the bf16 phase unconditionally contractive.
    c = 1.8 / (lam_floor + ninf)

    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = (rows == cols).astype(S.dtype)
    two_eye = 2.0 * eye
    x_ref[:] = c * eye

    def body_main(_, carry):
        t = two_eye - jnp.dot(S, x_ref[:],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        x_ref[:] = jnp.dot(x_ref[:], t, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return carry

    def body_f32(_, carry):
        # full 6-pass f32 (Mosaic's default f32 dot is a single bf16
        # pass -- the polish steps exist precisely to remove that floor)
        t = two_eye - jnp.dot(S, x_ref[:],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        x_ref[:] = jnp.dot(x_ref[:], t, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return carry

    jax.lax.fori_loop(0, n_iters - f32_polish, body_main, 0)
    jax.lax.fori_loop(0, f32_polish, body_f32, 0)
    out_ref[:] = x_ref[:]


@functools.partial(jax.jit, static_argnames=("lam_floor", "n_iters",
                                             "f32_polish"))
def sinv_pallas(S: jnp.ndarray, lam_floor: float = 1.0,
                n_iters: int = N_ITERS,
                f32_polish: int = F32_POLISH) -> jnp.ndarray:
    """Newton-Schulz SPD inverse on the MXU; S (M, M) float32 with
    lambda_min(S) >= lam_floor > 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = S.shape[0]
    mp = _pad_to_tile(m)
    if mp != m:
        # lam_floor-pad: inv(blockdiag(S, c I)) = blockdiag(inv(S), I/c);
        # padding with lam_floor keeps the padded spectrum inside the
        # real one so the init scaling stays valid.
        Sp = lam_floor * jnp.eye(mp, dtype=S.dtype)
        Sp = Sp.at[:m, :m].set(S)
    else:
        Sp = S
    out = pl.pallas_call(
        functools.partial(_sinv_kernel, lam_floor=float(lam_floor),
                          n_iters=n_iters, f32_polish=f32_polish),
        out_shape=jax.ShapeDtypeStruct((mp, mp), S.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mp, mp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_iters * 2 * mp * mp * mp,
            bytes_accessed=2 * mp * mp * 4,
            transcendentals=0,
        ),
    )(Sp)
    return out[:m, :m]


def spd_inverse(S: jnp.ndarray, lam_floor: float = 1.0) -> jnp.ndarray:
    """S^-1 for SPD S with lambda_min >= lam_floor: Pallas Newton-Schulz
    on TPU float32, Cholesky elsewhere (CPU tests, float64 parity)."""
    if S.dtype == jnp.float32 and jax.default_backend() == "tpu":
        return sinv_pallas(S, lam_floor=lam_floor)
    from jax.scipy.linalg import cho_factor, cho_solve

    eye = jnp.eye(S.shape[0], dtype=S.dtype)
    return cho_solve(cho_factor(S, lower=True), eye)
