"""Joint EKF update over a masked set of matches.

Reference: Update.cpp.  Given matched measurements z_i for a subset of the
predicted features, the reference stacks the per-feature 2-row Jacobians
into H, computes K = P H^T (H P H^T + R)^-1 with R = pixelError * I
(Update.cpp:92-109), applies x += K (z - h) and P <- (I - K H) P, then
symmetrizes P and renormalizes the quaternion with a Jacobian-corrected
covariance (Update.cpp:282-318).

TPU-first departures:
  * the update runs over *all* slots with a use-mask instead of a compacted
    match list: masked slots contribute zero Jacobian rows and zero
    residuals, and their S rows are replaced by the identity, which makes
    the masked dense update exactly equal to the compacted one;
  * S is factorized with Cholesky and solved, never explicitly inverted
    (the reference calls S.inv(), Update.cpp:108);
  * everything is one fused chain of (2F x N)(N x N) matmuls -- MXU food.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.filter import shardable
from openekfmonoslam_tpu.filter.measure import Prediction, dense_H
from openekfmonoslam_tpu.filter.state import CAM_DIM, FEAT_DIM, SlamState

# The reference's increment/residual deadband (Update.cpp:133-134, DELTA)
DELTA = 1.0e-12


def masked_innovation(pred: Prediction, z: jnp.ndarray, use: jnp.ndarray,
                      n_total: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual vector (2F,) and masked dense H (2F, N)."""
    dtype = pred.uv.dtype
    m = use[:, None].astype(dtype)
    res = ((z - pred.uv) * m).reshape(-1)
    H = dense_H(pred.Hc * m[:, :, None], pred.Hf * m[:, :, None], n_total)
    return res, H


def kalman_update(state: SlamState, pred: Prediction, z: jnp.ndarray,
                  use: jnp.ndarray, pixel_error: float,
                  update_covariance: bool = True,
                  deadband: bool = False) -> SlamState:
    """One joint update step (updateStateAndCovariance, Update.cpp:237-265).

    ``use`` marks the slots whose matches participate.  When no slot is
    used the state and covariance pass through unchanged (H == 0 implies
    K H == 0 and K res == 0), matching the reference's early-out
    (Update.cpp:292).
    """
    P = state.P
    dtype = P.dtype
    F = pred.uv.shape[0]

    # H P and H P H^T were assembled ONCE in measure.predict_measurements
    # (hp_products).  Masking rows of H commutes with the products, so
    # the update's masked versions are row/column-masked views -- no
    # re-assembly (the dense equivalence is locked by tests/test_filter.py
    # 's dense_H-based oracle).
    m = use[:, None].astype(dtype)
    res = ((z - pred.uv) * m).reshape(-1)
    if deadband:
        # stateUpdate zeroes residual components with magnitude <= DELTA
        # (Update.cpp:133-134); invisible in f32, exact in f64 parity runs
        res = jnp.where(jnp.abs(res) > DELTA, res, 0.0)
    use2 = jnp.repeat(use, 2)                          # (2F,) row mask
    u2 = use2.astype(dtype)
    HP = pred.HP * u2[:, None]                         # (2F, N)
    S = pred.Sfull * (u2[:, None] * u2[None, :])
    # R = pixelError * I on used rows (Update.cpp:95-97); identity rows for
    # masked slots keep S SPD without affecting the result.  Masked slots'
    # S rows/cols are already zero (the row mask above).
    r_diag = jnp.where(use2, jnp.asarray(pixel_error, dtype), 1.0)
    S = S + jnp.diag(r_diag)

    # K = P H^T S^-1  computed as  K^T = S^-1 (H P).  S^-1 is formed
    # explicitly (the reference itself inverts S, Update.cpp:108) and
    # applied as ONE (2F,2F)x(2F,N) matmul instead of cho_solve(S, HP):
    # identical math, but under P sharding the matmul contracts over the
    # replicated 2F dim so HP's column sharding flows through with ZERO
    # communication, where XLA's triangular_solve partitioner all-gathers
    # the full (2F,N) RHS twice (measured 1.7 MB of the 2.9 MB/step
    # per-device budget, tools/sharding_diag.py).  ops/sinv.py picks the
    # one-launch Pallas Newton-Schulz kernel on TPU f32 (the Cholesky +
    # solve custom-call chain measured ~104 us/frame); r_diag >=
    # min(pixelError, 1) floors lambda_min, which the kernel exploits.
    from openekfmonoslam_tpu.ops.sinv import spd_inverse
    lam_floor = min(float(pixel_error), 1.0)
    Sinv = spd_inverse(S, lam_floor=lam_floor)         # (2F, 2F) replicated
    KT = Sinv @ HP                                     # (2F, N)

    dx = KT.T @ res
    if deadband:
        # ... and skips increments with magnitude <= DELTA (:153-203)
        dx = jnp.where(jnp.abs(dx) > DELTA, dx, 0.0)
    x = state.x + dx
    if update_covariance:
        P = P - KT.T @ HP                              # (I - K H) P
    return state._replace(x=x, P=P)


def finalize_update(state: SlamState, applied: jnp.ndarray) -> SlamState:
    """Post-update numerics (update, Update.cpp:296-318): symmetrize P,
    renormalize the quaternion, and push the normalization Jacobian through
    the quaternion rows/columns of P.

    ``applied`` gates the whole correction (the reference only runs it when
    at least one match was used, Update.cpp:292).
    """
    P = 0.5 * (state.P + state.P.T)
    q = state.x[3:7]
    Jq = quat.normalize_jacobian(q)
    # quaternion rows/cols placed via filter.shardable (no scatter along
    # the sharded dim; bit-exact to the .at form)
    Pn = shardable.place_rows(P, Jq @ P[3:7, :], 3)
    Pn = shardable.place_cols(Pn, Pn[:, 3:7] @ Jq.T, 3)
    xn = state.x.at[3:7].set(q / jnp.linalg.norm(q))

    x = jnp.where(applied, xn, state.x)
    P = jnp.where(applied, Pn, state.P)
    return state._replace(x=x, P=P)


def update(state: SlamState, pred: Prediction, z: jnp.ndarray,
           use: jnp.ndarray, pixel_error: float,
           deadband: bool = False, use_kernel: bool = False) -> SlamState:
    """Full joint update + numerics (update, Update.cpp:282-318).

    ``use_kernel`` runs the whole chain (kalman_update + finalize_update)
    as ONE Pallas launch on TPU f32 (ops/update_kernel.py, equivalence to
    this XLA chain locked by tests/test_update_kernel.py); the deadband
    (quirks) path and non-applicable shapes keep the XLA chain."""
    if use_kernel and not deadband:
        from openekfmonoslam_tpu.ops.update_kernel import (
            joint_update_pallas, update_kernel_applicable)
        if update_kernel_applicable(state.P, pred.HP):
            x, P = joint_update_pallas(
                state.P, state.x, pred.HP, pred.Sfull, pred.uv, z, use,
                float(pixel_error), min(float(pixel_error), 1.0))
            return state._replace(x=x, P=P)
    new = kalman_update(state, pred, z, use, pixel_error,
                        update_covariance=True, deadband=deadband)
    return finalize_update(new, jnp.any(use))
