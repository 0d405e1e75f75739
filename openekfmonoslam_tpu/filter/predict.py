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


def predict(state: SlamState, config: SlamConfig, dt: float = 1.0
            ) -> SlamState:
    """One predict step: returns the state with x[0:13] and P advanced."""
    cam = state.x[:CAM_DIM]
    f = lambda c: motion_model(c, dt)  # noqa: E731
    F = jax.jacfwd(f)(cam)            # (13, 13)
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
