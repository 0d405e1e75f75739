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
from openekfmonoslam_tpu.filter.measure import Prediction, dense_H
from openekfmonoslam_tpu.filter.state import SlamState


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
                  update_covariance: bool = True) -> SlamState:
    """One joint update step (updateStateAndCovariance, Update.cpp:237-265).

    ``use`` marks the slots whose matches participate.  When no slot is
    used the state and covariance pass through unchanged (H == 0 implies
    K H == 0 and K res == 0), matching the reference's early-out
    (Update.cpp:292).
    """
    P = state.P
    dtype = P.dtype
    F = pred.uv.shape[0]

    res, H = masked_innovation(pred, z, use, P.shape[0])
    use2 = jnp.repeat(use, 2)                          # (2F,) row mask

    HP = H @ P                                         # (2F, N)
    S = HP @ H.T                                       # (2F, 2F)
    # R = pixelError * I on used rows (Update.cpp:95-97); identity rows for
    # masked slots keep S SPD without affecting the result.
    r_diag = jnp.where(use2, jnp.asarray(pixel_error, dtype), 1.0)
    m2 = use2.astype(dtype)
    S = S * m2[:, None] * m2[None, :] + jnp.diag(r_diag)

    # K = P H^T S^-1  computed as  K^T = S^-1 (H P)
    KT = cho_solve(cho_factor(S, lower=True), HP)      # (2F, N)

    x = state.x + KT.T @ res
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
    Pn = P.at[3:7, :].set(Jq @ P[3:7, :])
    Pn = Pn.at[:, 3:7].set(Pn[:, 3:7] @ Jq.T)
    xn = state.x.at[3:7].set(q / jnp.linalg.norm(q))

    x = jnp.where(applied, xn, state.x)
    P = jnp.where(applied, Pn, state.P)
    return state._replace(x=x, P=P)


def update(state: SlamState, pred: Prediction, z: jnp.ndarray,
           use: jnp.ndarray, pixel_error: float) -> SlamState:
    """Full joint update + numerics (update, Update.cpp:282-318)."""
    new = kalman_update(state, pred, z, use, pixel_error,
                        update_covariance=True)
    return finalize_update(new, jnp.any(use))
