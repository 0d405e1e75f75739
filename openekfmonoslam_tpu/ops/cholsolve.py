"""Fused SPD solve X = S^-1 B as ONE Pallas TPU kernel.

STATUS: built, numerically verified (1.9e-2 rel err at default MXU
precision, 1.5e-6 in interpret mode), NOT wired into the engine -- the
measured isolated cost on v5e is 293 us/solve vs 154 us for XLA's
cholesky+triangular_solve at (192, 640): the two 64-step sequential
factor/invert fori loops dominate (~0.7 us/step of VPU masked
reductions).  Kept as the experiment log for BASELINE.md's solve-kernel
row; the promising redesign is Newton-Schulz-exact triangular inversion
(the NS error term is nilpotent for triangular operands, so ceil(log2(n))
iterations of pure MXU matmuls invert EXACTLY) which removes every
element-sequential loop except an 8x8 unrolled base case.

Why it was attempted: the Kalman update's innovation solve
(Update.cpp:92-109 computes S.inv() explicitly; we Cholesky-solve) is
the largest custom-call block in the compiled step -- XLA's cholesky +
triangular_solve lower to ~56 small fusions (~90-120 us of launch
latency for a 2.4 MFLOP factorization; tools/roofline.py shows the step
is dispatch-bound, not FLOP-bound).  This kernel performs the blocked
Cholesky factorization, the diagonal-block triangular inversions, and
both triangular solves in a single pallas_call: everything lives in VMEM
(S is (M, M) <= 256x256 f32 = 256 KB; B is (M, N) <= 256x640 = 640 KB),
the block-level algebra runs on the MXU, and only the 64-wide diagonal
factor/invert loops are sequential VPU work.

Algorithm (right-looking blocked Cholesky, block size BS = 64):

  for k in blocks:                       # unrolled (static shapes)
      Lkk   = chol(A[k, k])              # 64-step fori, VPU
      Wk    = inv(Lkk)                   # 64-step forward subst., VPU
      A[>k, k]   = A[>k, k] @ Wk^T       # panel, MXU
      A[>k, >k] -= panel @ panel^T       # trailing update, MXU
  Y = forward_solve(L, B)   via the stored Wk  # MXU block solves
  X = backward_solve(L^T, Y)                   # MXU block solves

The wrapper `solve_spd` pads M up to a multiple of 64 with identity
rows/cols (exact: padded rows of the solution are just the padded B
rows) and N up to a multiple of 128, and falls back to
jax.scipy.linalg.cho_solve off-TPU or for float64 (the float64 CPU
parity/golden test path keeps the reference algebra).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.linalg import cho_factor, cho_solve

BS = 64  # Cholesky block size


def _factor_block(A):
    """Unblocked lower Cholesky of a (BS, BS) SPD block (right-looking)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 1)

    def body(j, carry):
        A, L = carry
        # column j via a masked reduction (Mosaic has no dynamic_slice on
        # values; summing true zeros is exact)
        colv = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1,
                       keepdims=True)                         # (BS, 1)
        iot = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
        pivot = jnp.sum(jnp.where(iot == j, colv, 0.0))
        d = jax.lax.rsqrt(jnp.maximum(pivot, 1e-30))
        lcol = jnp.where(iot >= j, colv * d, 0.0)             # (BS, 1)
        # trailing update A -= lcol lcol^T on rows/cols > j
        trail = (rows > j) & (cols > j)
        A = A - jnp.where(trail, lcol @ lcol.reshape(1, BS), 0.0)
        L = jnp.where(cols == j, lcol, L)
        return A, L

    _, L = jax.lax.fori_loop(0, BS, body, (A, jnp.zeros_like(A)))
    return L


def _invert_lower(L):
    """Inverse of a (BS, BS) lower-triangular block by forward
    substitution: W[j, :] = (e_j - L[j, :j] W[:j, :]) / L[j, j]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)

    def body(j, W):
        Lrow = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0,
                       keepdims=True)                          # (1, BS)
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
        ljj = jnp.sum(jnp.where(iot == j, Lrow, 0.0))
        Lrow_strict = jnp.where(iot < j, Lrow, 0.0)
        acc = jnp.dot(Lrow_strict, W,
                      preferred_element_type=L.dtype)          # (1, BS)
        ej = jnp.where(iot == j, 1.0, 0.0).astype(L.dtype)
        Wrow = (ej - acc) / ljj
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
        return jnp.where(rows2 == j, Wrow, W)

    return jax.lax.fori_loop(0, BS, body, jnp.zeros_like(L))


def _cholsolve_kernel(nb: int, S_ref, B_ref, X_ref, A_s, L_s, W_s, Y_s):
    """One-shot chol(S) + solve; nb = number of 64-blocks (static)."""
    dt = S_ref.dtype
    A_s[:] = S_ref[:]
    L_s[:] = jnp.zeros_like(L_s)

    # ---- blocked factorization (k unrolled: static slicing) ----
    for k in range(nb):
        o = k * BS
        Akk = A_s[o:o + BS, o:o + BS]
        Lkk = _factor_block(Akk)
        Wk = _invert_lower(Lkk)
        W_s[k * BS:(k + 1) * BS, :] = Wk
        L_s[o:o + BS, o:o + BS] = Lkk
        if k + 1 < nb:
            r = (k + 1) * BS
            m = (nb - k - 1) * BS
            panel = jnp.dot(A_s[r:r + m, o:o + BS], Wk.T,
                            preferred_element_type=dt)         # (m, BS)
            L_s[r:r + m, o:o + BS] = panel
            A_s[r:r + m, r:r + m] = (
                A_s[r:r + m, r:r + m]
                - jnp.dot(panel, panel.T, preferred_element_type=dt))

    # ---- forward solve L Y = B ----
    for k in range(nb):
        o = k * BS
        Wk = W_s[k * BS:(k + 1) * BS, :]
        rhs = B_ref[o:o + BS, :]
        if k > 0:
            rhs = rhs - jnp.dot(L_s[o:o + BS, 0:o], Y_s[0:o, :],
                                preferred_element_type=dt)
        Y_s[o:o + BS, :] = jnp.dot(Wk, rhs, preferred_element_type=dt)

    # ---- backward solve L^T X = Y ----
    for k in range(nb - 1, -1, -1):
        o = k * BS
        Wk = W_s[k * BS:(k + 1) * BS, :]
        rhs = Y_s[o:o + BS, :]
        if k + 1 < nb:
            r = (k + 1) * BS
            m = (nb - k - 1) * BS
            # L[r:r+m, o:o+BS]^T X[r:r+m]
            rhs = rhs - jnp.dot(L_s[r:r + m, o:o + BS].T, X_ref[r:r + m, :],
                                preferred_element_type=dt)
        X_ref[o:o + BS, :] = jnp.dot(Wk.T, rhs, preferred_element_type=dt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_pallas(S: jnp.ndarray, B: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """X = S^-1 B for SPD S, fused in one Pallas kernel.

    Requires S (M, M) with M a multiple of 64 and B (M, N) with N a
    multiple of 128 (use solve_spd for the padding wrapper).
    """
    M, N = B.shape
    assert S.shape == (M, M) and M % BS == 0 and N % 128 == 0, (S.shape,
                                                                B.shape)
    nb = M // BS
    kernel = functools.partial(_cholsolve_kernel, nb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), B.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, M), S.dtype),      # A (being factored)
            pltpu.VMEM((M, M), S.dtype),      # L
            pltpu.VMEM((M, BS), S.dtype),     # diagonal-block inverses
            pltpu.VMEM((M, N), B.dtype),      # Y (forward-solve result)
        ],
        interpret=interpret,
    )(S, B)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def solve_spd(S: jnp.ndarray, B: jnp.ndarray,
              force_pallas: bool | None = None) -> jnp.ndarray:
    """S^-1 B with the fused Pallas path on TPU/float32, padded to the
    kernel's alignment; identical-math cho_solve elsewhere (the float64
    CPU parity path keeps LAPACK-style algebra)."""
    use = (force_pallas if force_pallas is not None
           else (_on_tpu() and S.dtype == jnp.float32))
    if not use:
        return cho_solve(cho_factor(S, lower=True), B)

    M, N = B.shape
    Mp = -(-M // BS) * BS
    Np = -(-N // 128) * 128
    if Mp != M:
        # identity-pad: appended rows solve to the appended (zero) B rows
        S = jnp.pad(S, ((0, Mp - M), (0, Mp - M)))
        S = S.at[M:, M:].set(jnp.eye(Mp - M, dtype=S.dtype))
        B = jnp.pad(B, ((0, Mp - M), (0, 0)))
    if Np != N:
        B = jnp.pad(B, ((0, 0), (0, Np - N)))
    X = chol_solve_pallas(S, B)
    return X[:M, :N]
