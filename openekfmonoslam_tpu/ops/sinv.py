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
  * Iteration matmuls run with a two-term bf16 split of S (spectrum
    preserved to 2^-16 -- plain bf16 rounding of S was measured to
    destroy SPD and diverge) against a single-bf16 X: 3 MXU passes per
    iteration instead of HIGHEST's 12.  The bf16-X scheme is
    contractive while cond(S) <~ 1/eps_bf16; an in-kernel
    HIGHEST-precision residual probe catches the (never yet observed)
    high-cond spike and reruns full-precision Newton-Schulz from the
    provably-contractive init.  F32_POLISH HIGHEST steps finish at the
    ~cond * eps f32 floor -- the same class as Cholesky-solve.

`spd_inverse` picks this kernel on TPU float32 and falls back to
Cholesky-against-I elsewhere (CPU tests, float64 parity replays).
Accuracy + equivalence are locked by tests/test_sinv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITERS = 12          # happy-path total; the residual-gated
                      # rescue loop covers any higher cond
F32_POLISH = 2        # final full-f32 (HIGHEST) iterations
_LANE = 128


def _pad_to_tile(m: int) -> int:
    return ((m + _LANE - 1) // _LANE) * _LANE


def _dot3(a, b):
    """3-pass bf16-split matmul == jax "high" f32 precision (Mosaic only
    accepts DEFAULT/HIGHEST; HIGHEST's 6 passes measured ~2x the kernel
    time in the polish steps with no accuracy the polish needs)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jnp.dot(a_hi, b_hi, **kw) + jnp.dot(a_hi, b_lo, **kw)
            + jnp.dot(a_lo, b_hi, **kw))


def ns_inverse_into(S, x_ref, lam_floor: float, n_iters: int,
                    f32_polish: int) -> None:
    """Newton-Schulz SPD inverse of the VALUE ``S`` written into the VMEM
    scratch ``x_ref`` -- the body shared by the standalone sinv kernel
    below and the fused joint-update kernel (ops/update_kernel.py)."""
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

    # Two-term bf16 split of S for the cheap iterations: S_hi + S_lo
    # carries ~16 mantissa bits, so the spectrum of the PRODUCT operand
    # is preserved to ~2^-16 * lambda_max << lambda_floor -- the failure
    # mode of plain bf16 (spectrum perturbed by ~0.8% of lambda_max,
    # driving unit-scale eigenvalues negative) cannot occur.  X itself
    # rides single bf16: Newton-Schulz is self-correcting, and the
    # HIGHEST-precision polish steps square away the ~4e-3 bf16 floor.
    S_hi = S.astype(jnp.bfloat16)
    S_lo = (S - S_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body_main(_, carry):
        # precision pinned to DEFAULT: the engine wraps the step in
        # jax.default_matmul_precision("high"), which Mosaic rejects,
        # and bf16 operands want exactly one MXU pass anyway
        prec = jax.lax.Precision.DEFAULT
        xb = x_ref[:].astype(jnp.bfloat16)
        sx = (jnp.dot(S_hi, xb, preferred_element_type=jnp.float32,
                      precision=prec)
              + jnp.dot(S_lo, xb, preferred_element_type=jnp.float32,
                        precision=prec))
        t = (two_eye - sx).astype(jnp.bfloat16)
        x_ref[:] = jnp.dot(xb, t, preferred_element_type=jnp.float32,
                           precision=prec)
        return carry

    def body_f32(_, carry):
        # 3-pass bf16-split (~f32 products; Mosaic's default f32 dot is
        # a single bf16 pass -- the polish steps exist precisely to
        # remove that floor, and the 3-pass split already does)
        t = two_eye - _dot3(S, x_ref[:])
        x_ref[:] = _dot3(x_ref[:], t)
        return carry

    jax.lax.fori_loop(0, n_iters - f32_polish, body_main, 0)

    # First polish step, with its T = 2I - S X doubling as a FREE
    # convergence probe: max|T - I| is the Newton residual.  The bf16-X
    # iteration is only contractive while cond(S) stays below
    # ~1/eps_bf16 and N_ITERS only covers cond ~1e2-1e3; measured update
    # conditioning is ~1e2, but a tracking-stress frame could spike it,
    # and a silently diverged/unconverged S^-1 would destroy P.  The
    # rescue branch restarts from the provably-contractive init and runs
    # full-precision Newton-Schulz, which converges for ANY SPD S with
    # these spectrum bounds.
    t1 = two_eye - _dot3(S, x_ref[:])
    bad = jnp.max(jnp.abs(t1 - eye)) > 0.05
    x_ref[:] = _dot3(x_ref[:], t1)

    @pl.when(bad)
    def _():
        # Residual-driven rescue: iterate until the Newton residual
        # max|S X - I| is provably small rather than a fixed count (a
        # fixed 20 covers cond ~1e5; beyond that it would return a
        # silently unconverged inverse).  From the contractive init the
        # pre-update residual e satisfies e_{k+1} = e_k^2 < 1, so the
        # loop terminates for ANY SPD S; exit at e <= 5e-4 means the
        # post-update residual is ~2.5e-7, i.e. converged to the f32
        # floor before the polish steps.  The 128 cap covers cond beyond
        # f32 representability (2^128 >> any cond(S) expressible here).
        x_ref[:] = c * eye

        def rescue_cond(carry):
            k, res = carry
            return jnp.logical_and(res > 5e-4, k < 128)

        def rescue_body(carry):
            k, _ = carry
            t = two_eye - jnp.dot(S, x_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
            res = jnp.max(jnp.abs(t - eye))
            x_ref[:] = jnp.dot(x_ref[:], t,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            return k + 1, res

        jax.lax.while_loop(rescue_cond, rescue_body,
                           (jnp.int32(0), jnp.float32(1.0)))

    jax.lax.fori_loop(0, f32_polish - 1, body_f32, 0)


def _sinv_kernel(s_ref, out_ref, x_ref, lam_floor: float, n_iters: int,
                 f32_polish: int):
    ns_inverse_into(s_ref[:], x_ref, lam_floor, n_iters, f32_polish)
    out_ref[:] = x_ref[:]


@functools.partial(jax.jit, static_argnames=("lam_floor", "n_iters",
                                             "f32_polish"))
def sinv_pallas(S: jnp.ndarray, lam_floor: float = 1.0,
                n_iters: int = N_ITERS,
                f32_polish: int = F32_POLISH) -> jnp.ndarray:
    """Newton-Schulz SPD inverse on the MXU; S (M, M) float32 with
    lambda_min(S) >= lam_floor > 0."""
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


# The single-block kernel holds S, S_hi/S_lo, X, and dot temporaries in
# VMEM at once: M=512 fits comfortably, M=640 overflowed the 16 MB VMEM
# scoped stack (measured at max_features=275).  Larger maps take the
# Cholesky path until a tiled variant is warranted.
_MAX_PALLAS_M = 512


def spd_inverse(S: jnp.ndarray, lam_floor: float = 1.0) -> jnp.ndarray:
    """S^-1 for SPD S with lambda_min >= lam_floor: Pallas Newton-Schulz
    on TPU float32 (sizes up to _MAX_PALLAS_M), Cholesky elsewhere
    (large maps, CPU tests, float64 parity)."""
    if (S.dtype == jnp.float32 and S.shape[0] <= _MAX_PALLAS_M
            and jax.default_backend() == "tpu"):
        return sinv_pallas(S, lam_floor=lam_floor)
    from jax.scipy.linalg import cho_factor, cho_solve

    eye = jnp.eye(S.shape[0], dtype=S.dtype)
    return cho_solve(cho_factor(S, lower=True), eye)
