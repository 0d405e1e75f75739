"""Feature lifecycle: inverse-depth initialization into free slots.

Reference: AddMapFeature.cpp.  A new landmark is initialized from a
detected pixel: undistort, back-project to a unit-depth camera ray, rotate
to world, convert to (theta, phi) bearing with rho = InitInvDepthRho
(:293-350); the covariance grows by a 6-dim block built from the init
Jacobian J1 = d(feature)/d(r, q) and J2 = d(feature)/d(u, v, rho) with
measurement noise diag(pixelErrorX^2, pixelErrorY^2, rhoSD^2) (:109-289).

TPU-first departures:
  * no covariance reshape -- the new block is written into a preallocated
    (previously zeroed) slot, preserving the masked-P invariant;
  * J1/J2 come from jax.jacfwd of the exact init function (replacing the
    hand chain rule at :109-216);
  * a batch of candidates is added with a `lax.scan` (additions are order
    dependent: each new feature's cross-covariance involves previously
    added ones, as in the sequential loop at :354-367) -- but each addition
    only touches a 6-row strip, so the scan body is tiny.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.core import camera as cam_mod
from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter.state import CAM_DIM, FEAT_DIM, SlamState


def init_feature(camera: Camera, cam7: jnp.ndarray, uv_rho: jnp.ndarray
                 ) -> jnp.ndarray:
    """(r, q, pixel, rho) -> inverse-depth 6-vector.

    (addFeatureToStateAndCovariance, AddMapFeature.cpp:293-332): anchor is
    the camera position; bearing from the undistorted back-projected ray
    rotated to world; theta = atan2(fx, fz), phi = atan2(-fy, sqrt(fx^2+fz^2)).
    """
    r, q = cam7[0:3], cam7[3:7]
    uv_undist = cam_mod.undistort(camera, uv_rho[0:2])
    ray_cam = cam_mod.back_project(camera, uv_undist)
    ray_w = quat.to_rotation_matrix(q) @ ray_cam
    theta = jnp.arctan2(ray_w[0], ray_w[2])
    phi = jnp.arctan2(-ray_w[1], jnp.sqrt(ray_w[0] ** 2 + ray_w[2] ** 2))
    return jnp.concatenate([r, jnp.stack([theta, phi, uv_rho[2]])])


def _add_one(state: SlamState, camera: Camera, uv: jnp.ndarray,
             desc: jnp.ndarray, slot: jnp.ndarray, valid: jnp.ndarray,
             pixel_error_x: float, pixel_error_y: float, rho_sd: float,
             init_rho: float) -> SlamState:
    """Write one feature into ``slot``; no-op when ``valid`` is False."""
    P = state.P
    dtype = P.dtype
    N = P.shape[0]
    cam7 = state.x[:7]
    uv_rho = jnp.concatenate([uv, jnp.asarray([init_rho], dtype=dtype)])

    feat = init_feature(camera, cam7, uv_rho)
    J1 = jax.jacfwd(lambda c: init_feature(camera, c, uv_rho))(cam7)   # (6,7)
    J2 = jax.jacfwd(lambda m: init_feature(camera, cam7, m))(uv_rho)   # (6,3)

    r_add = jnp.asarray(
        [pixel_error_x ** 2, pixel_error_y ** 2, rho_sd ** 2], dtype=dtype)

    # New block row against the whole current state (addFeatureToCovariance
    # Matrix, AddMapFeature.cpp:272): cross = J1 @ P[0:7, :].
    cross = J1 @ P[:7, :]                                   # (6, N)
    block = cross[:, :7] @ J1.T + J2 @ (r_add[:, None] * J2.T)  # (6, 6)

    off = CAM_DIM + FEAT_DIM * slot
    P_new = jax.lax.dynamic_update_slice(P, cross, (off, jnp.int32(0)))
    P_new = jax.lax.dynamic_update_slice(P_new, cross.T, (jnp.int32(0), off))
    P_new = jax.lax.dynamic_update_slice(P_new, block, (off, off))

    x_new = jax.lax.dynamic_update_slice(state.x, feat, (off,))

    valid_i = valid.astype(jnp.int32)
    return state._replace(
        x=jnp.where(valid, x_new, state.x),
        P=jnp.where(valid, P_new, P),
        active=state.active.at[slot].set(valid | state.active[slot]),
        is_xyz=state.is_xyz.at[slot].set(
            jnp.where(valid, False, state.is_xyz[slot])),
        times_predicted=state.times_predicted.at[slot].multiply(1 - valid_i),
        times_matched=state.times_matched.at[slot].multiply(1 - valid_i),
        descriptors=state.descriptors.at[slot].set(
            jnp.where(valid, desc, state.descriptors[slot])),
    )


def add_features(state: SlamState, camera: Camera, config: SlamConfig,
                 cand_uv: jnp.ndarray, cand_desc: jnp.ndarray,
                 cand_valid: jnp.ndarray) -> SlamState:
    """Add up to C candidate measurements into free slots (sequential scan,
    addFeaturesToStateAndCovariance, AddMapFeature.cpp:354-367)."""
    Fslots = state.n_features
    free_slots = jnp.nonzero(~state.active, size=Fslots, fill_value=Fslots)[0]
    n_free = jnp.sum(~state.active)
    ranks = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    ok = cand_valid & (ranks < n_free)
    slots = free_slots[jnp.clip(ranks, 0, Fslots - 1)]
    slots = jnp.clip(slots, 0, Fslots - 1).astype(jnp.int32)

    ekf = config.ekf
    cam = config.camera

    def body(st, inputs):
        uv, desc, slot, valid = inputs
        st = _add_one(st, camera, uv, desc, slot, valid,
                      cam.pixel_error_x, cam.pixel_error_y,
                      ekf.inverse_depth_rho_sd, ekf.init_inv_depth_rho)
        return st, None

    state, _ = jax.lax.scan(body, state, (cand_uv, cand_desc, slots, ok))
    return state
