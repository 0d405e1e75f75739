"""The whole joint EKF update as ONE Pallas MXU kernel.

filter/update.py's chain -- mask rows of the shared H P / H P H^T
products, add the measurement noise diagonal, invert S, form
K^T = S^-1 (H P), apply x += K^T^T res and P -= K^T^T (H P), then the
post-update numerics (symmetrize, quaternion renormalization with the
Jacobian pushed through P's quaternion rows/columns, Update.cpp:282-318)
-- compiles under XLA to the two Pallas S-inverse launches plus ~20
small fusions per update, twice per frame (~45 us/frame total at the
~1.2 us/kernel dispatch floor).  Here the full chain runs as ONE kernel
per update: the Newton-Schulz inverse (ops/sinv.ns_inverse_value, same
algorithm and residual-gated rescue), the Kalman matmuls, and the
finalize numerics all stay in VMEM.

Two deliberate algebraic reassociations, both ulp-level:

  * the symmetrize 0.5 (P' + P'^T) is folded into the downdate as
    P - 0.5 (D + D^T) with D = (H P)^T W and D^T computed as a second
    dot_general (W^T (H P)) instead of transposing -- exact when the
    incoming P is symmetric, which it is up to matmul accumulation
    order (every writer of P preserves symmetry elementwise);
  * the quaternion-Jacobian row/column push is applied as low-rank
    one-hot-selector matmul deltas instead of sliced scatters (no
    unaligned VMEM lane stores).

Correctness vs the XLA chain (to f32 roundoff) is locked by
tests/test_update_kernel.py.  Only the single-chip float32 TPU path
uses this kernel (config.update_kernel); CPU tests, float64 parity
replays, quirks (DELTA deadband) and sharded runs keep the XLA chain.

Reference being re-designed: Update.cpp:92-109 (K = P H^T S^-1 with an
explicit S.inv()), :237-265 (joint update), :282-318 (post-update
numerics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openekfmonoslam_tpu.ops.sinv import N_ITERS, F32_POLISH, \
    ns_inverse_into

_LANE = 128


def _pad_to_tile(m: int) -> int:
    return ((m + _LANE - 1) // _LANE) * _LANE


def _dot3(a, b, dims):
    """3-pass bf16-split dot_general == jax's "high" f32 precision: the
    engine's covariance algebra runs under default_matmul_precision
    ("high"), but Mosaic only accepts DEFAULT/HIGHEST -- HIGHEST's 6
    passes measured ~2x the device time on the (Mp, N)^2 downdates, so
    emulate the 3-pass split explicitly (a_hi b_hi + a_hi b_lo +
    a_lo b_hi, each a single MXU pass with f32 accumulation)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jax.lax.dot_general(a_hi, b_hi, dims, **kw)
            + jax.lax.dot_general(a_hi, b_lo, dims, **kw)
            + jax.lax.dot_general(a_lo, b_hi, dims, **kw))


def _update_kernel(p_ref, x_ref, hp_ref, sf_ref, u2c_ref, u2r_ref,
                   res_ref, app_ref, pout_ref, xout_ref, xinv_ref, w_ref,
                   *, pixel_error: float, lam_floor: float, n_iters: int,
                   f32_polish: int):
    N = p_ref.shape[0]
    hi = jax.lax.Precision.HIGHEST

    u2c = u2c_ref[:]                     # (Mp, 1) 0/1 row mask
    u2r = u2r_ref[:]                     # (1, Mp)
    res = res_ref[:] * u2c               # (Mp, 1) masked residual
    applied = app_ref[0, 0]              # 1.0 when any slot is used

    m = sf_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = (rows == cols).astype(jnp.float32)
    # S = masked H P H^T + diag(r): r = pixel_error on used rows, 1.0 on
    # masked/padded rows (keeps S SPD without affecting the result;
    # filter/update.py kalman_update)
    r_diag = u2c * pixel_error + (1.0 - u2c)
    S = sf_ref[:] * (u2c * u2r) + eye * r_diag

    ns_inverse_into(S, xinv_ref, lam_floor, n_iters, f32_polish)

    # K^T = S^-1 (H P) into the (Mp, N) scratch; rows of H P masked
    nn = (((1,), (0,)), ((), ()))
    w_ref[:] = _dot3(xinv_ref[:], hp_ref[:] * u2c, nn)

    # dx = K res as a row vector: res^T W -> (1, N)
    dxr = jax.lax.dot_general(res, w_ref[:], (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=hi)
    x_new = x_ref[:] + applied * dxr

    # P' = P - 0.5 (D + D^T), D = (H P)^T W; D^T computed directly as
    # W^T (H P) (same products, MXU-transposed contraction) -- this IS
    # the update.py downdate with finalize's symmetrize folded in.
    # Accumulated through pout_ref one term at a time to bound VMEM.
    half = 0.5 * applied
    tt = (((0,), (0,)), ((), ()))
    pout_ref[:] = p_ref[:] - half * _dot3(hp_ref[:] * u2c, w_ref[:], tt)
    pout_ref[:] = pout_ref[:] - half * _dot3(w_ref[:], hp_ref[:] * u2c, tt)

    # ---- finalize (Update.cpp:282-318), gated by ``applied`` ----
    # quaternion renormalization Jacobian at the post-update q
    qw = x_new[0, 3]
    qx = x_new[0, 4]
    qy = x_new[0, 5]
    qz = x_new[0, 6]
    n2 = qw * qw + qx * qx + qy * qy + qz * qz
    inv_n = jax.lax.rsqrt(n2)
    a = inv_n * inv_n * inv_n
    jq = ((qx * qx + qy * qy + qz * qz, -qw * qx, -qw * qy, -qw * qz),
          (-qx * qw, qw * qw + qy * qy + qz * qz, -qx * qy, -qx * qz),
          (-qy * qw, -qy * qx, qw * qw + qx * qx + qz * qz, -qy * qz),
          (-qz * qw, -qz * qx, -qz * qy, qw * qw + qx * qx + qy * qy))

    # rows 3:7 <- Jq P[3:7, :] (static sublane slices, exact f32 VPU)
    q_rows = pout_ref[3:7, :]                             # (4, N)
    jq_rows = jnp.concatenate(
        [sum((a * jq[i][j]) * q_rows[j:j + 1, :] for j in range(4))
         for i in range(4)], axis=0)                      # (4, N)

    @pl.when(applied > 0.5)
    def _():
        pout_ref[3:7, :] = jq_rows

    # cols 3:7 <- (P cols) Jq^T likewise (static lane slices)
    q_cols = pout_ref[:, 3:7]                             # (N, 4)
    jq_cols = jnp.concatenate(
        [sum((a * jq[i][j]) * q_cols[:, j:j + 1] for j in range(4))
         for i in range(4)], axis=1)                      # (N, 4)

    @pl.when(applied > 0.5)
    def _():
        pout_ref[:, 3:7] = jq_cols

    # x quaternion renormalization on lanes 3:7
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x_new.shape[1]), 1)
    is_q = (lane >= 3) & (lane < 7)
    scale = jnp.where(is_q & (applied > 0.5), inv_n, 1.0)
    xout_ref[:] = x_new * scale


@functools.partial(jax.jit, static_argnames=("pixel_error", "lam_floor"))
def joint_update_pallas(P: jnp.ndarray, x: jnp.ndarray, HP: jnp.ndarray,
                        Sfull: jnp.ndarray, uv: jnp.ndarray,
                        z: jnp.ndarray, use: jnp.ndarray,
                        pixel_error: float, lam_floor: float):
    """(x', P') -- the full joint update + finalize in one launch.

    ``P`` (N, N) f32 with N a multiple of 128; ``HP`` (2F, N);
    ``Sfull`` (2F, 2F); ``uv``/``z`` (F, 2); ``use`` (F,) bool."""
    N = P.shape[0]
    M = HP.shape[0]
    Mp = _pad_to_tile(M)
    f32 = jnp.float32

    use2 = jnp.repeat(use, 2)
    u2 = use2.astype(f32)
    res = ((z - uv) * use[:, None].astype(f32)).reshape(-1)

    u2c = jnp.zeros((Mp, 1), f32).at[:M, 0].set(u2)
    u2r = jnp.zeros((1, Mp), f32).at[0, :M].set(u2)
    res2 = jnp.zeros((Mp, 1), f32).at[:M, 0].set(res)
    HP2 = jnp.zeros((Mp, N), f32).at[:M].set(HP)
    Sf2 = jnp.zeros((Mp, Mp), f32).at[:M, :M].set(Sfull)
    app = jnp.any(use).astype(f32).reshape(1, 1)
    xrow = x.reshape(1, N)

    pout, xout = pl.pallas_call(
        functools.partial(_update_kernel, pixel_error=float(pixel_error),
                          lam_floor=float(lam_floor), n_iters=N_ITERS,
                          f32_polish=F32_POLISH),
        out_shape=(jax.ShapeDtypeStruct((N, N), f32),
                   jax.ShapeDtypeStruct((1, N), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((Mp, Mp), jnp.float32),
                        pltpu.VMEM((Mp, N), jnp.float32)],
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * (N_ITERS * 2 * Mp ** 3 + 3 * Mp * N * Mp
                       + 2 * Mp * N * N),
            bytes_accessed=3 * N * N * 4,
            transcendentals=0,
        ),
    )(P, xrow, HP2, Sf2, u2c, u2r, res2, app)
    return xout.reshape(N), pout


# VMEM bound: the kernel holds P, D, D^T (N^2 f32 each) plus the padded
# (Mp, N) factors and the (Mp, Mp) inverse temporaries.  N=640, Mp=256
# measures ~9 MB; N=896 would exceed the 16 MB budget.
_MAX_N = 768
_MAX_M = 512


def update_kernel_applicable(P: jnp.ndarray, HP: jnp.ndarray) -> bool:
    return (P.dtype == jnp.float32 and P.shape[0] % _LANE == 0
            and P.shape[0] <= _MAX_N and HP.shape[0] <= _MAX_M
            and jax.default_backend() == "tpu")
