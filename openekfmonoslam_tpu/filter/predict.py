"""EKF predict: constant-velocity motion model + covariance propagation.

Reference: StateAndCovariancePrediction.cpp.  The motion model is

    r' = r + v dt
    q' = q (x) quat(w dt)          (quaternion compose, EKFMath.cpp:82)
    v' = v
    w' = w

with dt = 1 frame (hard-coded in the reference, StateAndCovariancePrediction
.cpp:246).  The covariance propagates as P <- F P F^T + G Q G^T where only
the 13x13 camera block and the 13xN cross strips are touched
(StateAndCovariancePrediction.cpp:226-239) -- feature blocks are static.

TPU-first departures:
  * F (13x13) is obtained by jax.jacfwd of the motion model instead of the
    hand-derived quaternion-by-omega formulas (StateAndCovariancePrediction
    .cpp:100-148) -- same matrix, minus transcription risk.  The noise
    Jacobian G reuses F's dq'/dw block (the process noise enters the
    dynamics exactly like w, StateAndCovariancePrediction.cpp:210-212).
  * The strip updates are two (13,N)x(N,) matmuls over the full padded
    state; inactive dims stay zero because their P rows/cols are zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.filter import shardable
from openekfmonoslam_tpu.filter.state import CAM_DIM, SlamState


def motion_model(cam13: jnp.ndarray, dt: float) -> jnp.ndarray:
    """13-dim camera state transition (predictState, StateAndCovariancePrediction.cpp:43-65)."""
    r, q, v, w = cam13[0:3], cam13[3:7], cam13[7:10], cam13[10:13]
    q_new = quat.multiply(q, quat.from_axis_angle(w * dt))
    return jnp.concatenate([r + v * dt, q_new, v, w])


def motion_jacobian(cam13: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Analytic F = d(motion_model)/d(cam13), (13, 13).

    The same matrix jax.jacfwd extracts (locked elementwise by
    tests/test_filter.py), assembled from the closed-form quaternion
    product Jacobians -- the jvp machinery compiled to ~20 extra tiny
    kernels per frame.  Mirrors the reference's hand derivation
    (StateAndCovariancePrediction.cpp:100-189) with the exact small-angle
    limits instead of its EPSILON branch.

      dq'/dq = R(q2)   (right-multiplication matrix of q2 = quat(w dt))
      dq'/dw = L(q) dq2/d(w dt) dt
    """
    dtype = cam13.dtype
    q = cam13[3:7]
    w_vec = cam13[10:13]
    v_ = w_vec * dt
    n2 = v_ @ v_
    n = jnp.sqrt(n2)
    half = 0.5 * n
    c = jnp.cos(half)
    # s = sin(n/2)/n and g = (cos(n/2)/2 - s)/n^2 with exact n->0 limits
    small = n < 1e-6
    n_safe = jnp.where(small, 1.0, n)
    s = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / n_safe)
    g = jnp.where(small, -1.0 / 24.0 + n2 / 960.0,
                  (0.5 * c - s) / jnp.where(small, 1.0, n2))

    # dq2/d(v_) (4, 3): row 0 = -s/2 v^T; rows 1:4 = s I + g v v^T
    dq2 = jnp.concatenate([
        (-0.5 * s * v_)[None, :],
        s * jnp.eye(3, dtype=dtype) + g * jnp.outer(v_, v_),
    ], axis=0)

    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    L = jnp.asarray([[qw, -qx, -qy, -qz],
                     [qx, qw, -qz, qy],
                     [qy, qz, qw, -qx],
                     [qz, -qy, qx, qw]], dtype=dtype)
    dq_dw = (L @ dq2) * dt                               # (4, 3)

    q2 = jnp.concatenate([c[None], s * v_])             # quat(w dt)
    aw, ax, ay, az = q2[0], q2[1], q2[2], q2[3]
    Rr = jnp.asarray([[aw, -ax, -ay, -az],
                      [ax, aw, az, -ay],
                      [ay, -az, aw, ax],
                      [az, ay, -ax, aw]], dtype=dtype)   # right-mult by q2

    F = jnp.zeros((CAM_DIM, CAM_DIM), dtype=dtype)
    F = F.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    F = F.at[0:3, 7:10].set(jnp.eye(3, dtype=dtype) * dt)
    F = F.at[3:7, 3:7].set(Rr)
    F = F.at[3:7, 10:13].set(dq_dw)
    F = F.at[7:10, 7:10].set(jnp.eye(3, dtype=dtype))
    F = F.at[10:13, 10:13].set(jnp.eye(3, dtype=dtype))
    return F


def predict(state: SlamState, config: SlamConfig, dt: float = 1.0,
            use_kernel: bool = False) -> SlamState:
    """One predict step: returns the state with x[0:13] and P advanced.

    ``use_kernel`` runs the whole phase as ONE Pallas launch on TPU f32
    (ops/predict_kernel.py, equivalence locked by
    tests/test_update_kernel.py); other dtypes/backends keep this XLA
    chain."""
    if use_kernel:
        from openekfmonoslam_tpu.ops.predict_kernel import (
            predict_kernel_applicable, predict_pallas)
        if predict_kernel_applicable(state.P):
            lin = (config.ekf.linear_accel_sd * dt) ** 2
            ang = (config.ekf.angular_accel_sd * dt) ** 2
            x, P = predict_pallas(state.P, state.x, dt, lin, ang)
            return state._replace(x=x, P=P)
    cam = state.x[:CAM_DIM]
    f = lambda c: motion_model(c, dt)  # noqa: E731
    F = motion_jacobian(cam, dt)      # (13, 13), == jax.jacfwd(f)(cam)
    cam_new = f(cam)

    # G (13x6): d(state)/d(noise (v_err, w_err)); noise enters the dynamics
    # identically to (v, w), so reuse F's columns for the quaternion block.
    dtype = state.P.dtype
    G = jnp.zeros((CAM_DIM, 6), dtype=dtype)
    G = G.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype) * dt)
    G = G.at[3:7, 3:6].set(F[3:7, 10:13])
    G = G.at[7:10, 0:3].set(jnp.eye(3, dtype=dtype))
    G = G.at[10:13, 3:6].set(jnp.eye(3, dtype=dtype))

    lin = (config.ekf.linear_accel_sd * dt) ** 2
    ang = (config.ekf.angular_accel_sd * dt) ** 2
    q_diag = jnp.asarray([lin] * 3 + [ang] * 3, dtype=dtype)

    # Row/column placement goes through filter.shardable so the strip
    # update never scatters along P's (possibly row-sharded) leading dim:
    # bit-exact to .at[...].set, zero full-P communication under pjit.
    P = state.P
    top = F @ P[:CAM_DIM, :]                       # (13, N) strip
    P = shardable.place_rows(P, top, 0)
    P = shardable.place_cols(P, P[:, :CAM_DIM] @ F.T, 0)
    Qc = G @ (q_diag[:, None] * G.T)               # (13, 13)
    P = shardable.place_block(P, P[:CAM_DIM, :CAM_DIM] + Qc, 0, 0)

    x = state.x.at[:CAM_DIM].set(cam_new)
    return state._replace(x=x, P=P)
