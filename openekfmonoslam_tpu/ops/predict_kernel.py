"""The whole EKF predict phase as ONE Pallas kernel.

filter/predict.py's chain -- the 13-dim constant-velocity motion model,
the analytic F (quaternion-product Jacobians), the process-noise block
Q = G diag(q) G^T, and the three P placements (rows 0:13, cols 0:13,
corner add) -- compiles under XLA to ~25 small fusions costing ~27
us/frame at the ~1.2 us/kernel dispatch floor (predict.py +
core/quaternion.py, per-source-line trace attribution).  Here the whole
phase is ONE kernel: F and Q are built from scalar reads of x as
iota-masked (13, 13) accumulations, the strip updates are two 3-pass
bf16-split matmuls (== the engine's "high" matmul precision), and only
rows/cols 0:13 of the aliased P are rewritten.

Math is line-for-line filter/predict.py (same reference citations:
StateAndCovariancePrediction.cpp:43-65 motion model, :100-189 Jacobian,
:210-239 noise + strip updates); equivalence to the XLA chain at f32
roundoff is locked by tests/test_update_kernel.py.  Only the
single-chip float32 TPU path uses it (config.predict_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openekfmonoslam_tpu.filter.state import CAM_DIM

_LANE = 128


def _dot3(a, b):
    """3-pass bf16-split matmul (jax "high" f32 precision; Mosaic only
    accepts DEFAULT/HIGHEST and HIGHEST's 6 passes are 2x the time)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jnp.dot(a_hi, b_hi, **kw) + jnp.dot(a_hi, b_lo, **kw)
            + jnp.dot(a_lo, b_hi, **kw))


def _predict_kernel(p_ref, x_ref, pout_ref, xout_ref, *, dt: float,
                    lin: float, ang: float):
    f32 = jnp.float32
    C = CAM_DIM

    r0, r1, r2 = x_ref[0, 0], x_ref[0, 1], x_ref[0, 2]
    qw, qx, qy, qz = x_ref[0, 3], x_ref[0, 4], x_ref[0, 5], x_ref[0, 6]
    v0, v1, v2 = x_ref[0, 7], x_ref[0, 8], x_ref[0, 9]
    w0, w1, w2 = x_ref[0, 10], x_ref[0, 11], x_ref[0, 12]

    # ---- quat(w dt) with exact small-angle limits (predict.py) ----
    u0, u1, u2 = w0 * dt, w1 * dt, w2 * dt
    n2 = u0 * u0 + u1 * u1 + u2 * u2
    n = jnp.sqrt(n2)
    half = 0.5 * n
    cth = jnp.cos(half)
    small = n < 1e-6
    n_safe = jnp.where(small, 1.0, n)
    s = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / n_safe)
    g = jnp.where(small, -1.0 / 24.0 + n2 / 960.0,
                  (0.5 * cth - s) / jnp.where(small, 1.0, n2))
    aw, ax, ay, az = cth, s * u0, s * u1, s * u2        # q2 = quat(w dt)

    # q_new = q (x) q2 (quaternion product)
    qnw = qw * aw - qx * ax - qy * ay - qz * az
    qnx = qw * ax + qx * aw + qy * az - qz * ay
    qny = qw * ay - qx * az + qy * aw + qz * ax
    qnz = qw * az + qx * ay - qy * ax + qz * aw

    # dq2/d(w dt) (4, 3): row 0 = -s/2 u^T; rows 1:4 = s I + g u u^T
    dq2 = ((-0.5 * s * u0, -0.5 * s * u1, -0.5 * s * u2),
           (s + g * u0 * u0, g * u0 * u1, g * u0 * u2),
           (g * u1 * u0, s + g * u1 * u1, g * u1 * u2),
           (g * u2 * u0, g * u2 * u1, s + g * u2 * u2))
    # L(q) (4, 4) left-multiplication matrix
    L = ((qw, -qx, -qy, -qz), (qx, qw, -qz, qy),
         (qy, qz, qw, -qx), (qz, -qy, qx, qw))
    # dq'/dw = L dq2 * dt  (4, 3)
    dqdw = tuple(tuple(sum(L[i][k] * dq2[k][j] for k in range(4)) * dt
                       for j in range(3)) for i in range(4))
    # dq'/dq = right-multiplication matrix of q2  (4, 4)
    Rr = ((aw, -ax, -ay, -az), (ax, aw, az, -ay),
          (ay, -az, aw, ax), (az, ay, -ax, aw))

    # ---- F (13, 13) assembled from iota masks ----
    ri = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    F = (ri == ci).astype(f32)                          # identity base
    F = F + dt * ((ri == ci - 7) & (ri < 3)).astype(f32)   # dr/dv
    for i in range(4):
        for j in range(4):
            val = Rr[i][j] - (1.0 if i == j else 0.0)
            F = F + val * ((ri == 3 + i) & (ci == 3 + j)).astype(f32)
        for j in range(3):
            F = F + dqdw[i][j] * ((ri == 3 + i)
                                  & (ci == 10 + j)).astype(f32)

    # ---- Q corner = G diag(q) G^T (13, 13) ----
    # G: dr/dverr = dt I, dv/dverr = I, dq/dwerr = dqdw, dw/dwerr = I
    # (noise enters the dynamics exactly like (v, w), predict.py)
    Qc = jnp.zeros((C, C), f32)
    Qc = Qc + (lin * dt * dt) * ((ri == ci) & (ri < 3)).astype(f32)
    Qc = Qc + (lin * dt) * (((ri == ci - 7) | (ri - 7 == ci))
                            & ((ri < 3) | (ci < 3))).astype(f32)
    Qc = Qc + lin * ((ri == ci) & (ri >= 7) & (ri < 10)).astype(f32)
    Qc = Qc + ang * ((ri == ci) & (ri >= 10)).astype(f32)
    for i in range(4):
        # dq-dq block: ang * dqdw dqdw^T; dq-dw coupling: ang * dqdw
        for j in range(4):
            v = ang * sum(dqdw[i][k] * dqdw[j][k] for k in range(3))
            Qc = Qc + v * ((ri == 3 + i) & (ci == 3 + j)).astype(f32)
        for j in range(3):
            v = ang * dqdw[i][j]
            Qc = Qc + v * ((ri == 3 + i) & (ci == 10 + j)).astype(f32)
            Qc = Qc + v * ((ri == 10 + j) & (ci == 3 + i)).astype(f32)

    # ---- P strip updates (aliased P: only rows/cols 0:13 rewritten) ----
    top = _dot3(F, p_ref[0:C, :])                       # (13, N)
    pout_ref[0:C, :] = top
    # cols after the row placement (predict.py order): P[:, :13] F^T
    colsP = pout_ref[:, 0:C]                            # (N, 13)
    # (N, 13) @ (13, 13)^T as dot_general contracting F's col axis
    f_hi = F.astype(jnp.bfloat16)
    f_lo = (F - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    c_hi = colsP.astype(jnp.bfloat16)
    c_lo = (colsP - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    tdims = (((1,), (1,)), ((), ()))
    new_cols = (jax.lax.dot_general(c_hi, f_hi, tdims, **kw)
                + jax.lax.dot_general(c_hi, f_lo, tdims, **kw)
                + jax.lax.dot_general(c_lo, f_hi, tdims, **kw))
    pout_ref[:, 0:C] = new_cols
    pout_ref[0:C, 0:C] = pout_ref[0:C, 0:C] + Qc

    # ---- x: lanes 0:13 replaced by the propagated camera state ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x_ref.shape[1]), 1)
    newv = (r0 + v0 * dt, r1 + v1 * dt, r2 + v2 * dt,
            qnw, qnx, qny, qnz, v0, v1, v2, w0, w1, w2)
    x_new = x_ref[:]
    for i, v in enumerate(newv):
        x_new = jnp.where(lane == i, v, x_new)
    xout_ref[:] = x_new


@functools.partial(jax.jit, static_argnames=("dt", "lin", "ang"))
def predict_pallas(P: jnp.ndarray, x: jnp.ndarray, dt: float, lin: float,
                   ang: float):
    """(x', P') -- the full predict phase in one launch.  ``lin``/``ang``
    are the (linear_accel_sd * dt)^2 / (angular_accel_sd * dt)^2 process
    noise variances."""
    N = P.shape[0]
    xrow = x.reshape(1, N)
    pout, xout = pl.pallas_call(
        functools.partial(_predict_kernel, dt=float(dt), lin=float(lin),
                          ang=float(ang)),
        out_shape=(jax.ShapeDtypeStruct((N, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, N), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        input_output_aliases={0: 0},
    )(P, xrow)
    return xout.reshape(N), pout


# Whole-P-in-VMEM bound: the aliased (N, N) f32 block must fit the
# 128 MB v5e VMEM alongside the strip temporaries; N=4096 (64 MB)
# compiles and runs, N=8192 (256 MB) is rejected by Mosaic.
_MAX_N = 4096


def predict_kernel_applicable(P: jnp.ndarray) -> bool:
    return (P.dtype == jnp.float32 and P.shape[0] % _LANE == 0
            and P.shape[0] <= _MAX_N
            and jax.default_backend() == "tpu")
