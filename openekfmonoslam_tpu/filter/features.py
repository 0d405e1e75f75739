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
  * the reference's sequential addition loop (:354-367) is replaced by a
    closed-form batched construction that reproduces it exactly (see
    add_features).
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


def assign_slots(active: jnp.ndarray, cand_valid: jnp.ndarray
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic slot assignment: valid candidates fill the free slots
    in increasing slot order.  Returns (slots, ok) where ``ok`` marks the
    candidates that actually fit; dropped/invalid candidates get the
    out-of-range slot F (so scatters discard them)."""
    Fslots = active.shape[0]
    free_slots = jnp.nonzero(~active, size=Fslots, fill_value=Fslots)[0]
    n_free = jnp.sum((~active).astype(jnp.int32))
    ranks = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    ok = cand_valid & (ranks < n_free)
    slots = jnp.where(ok, free_slots[jnp.clip(ranks, 0, Fslots - 1)],
                      Fslots).astype(jnp.int32)
    return slots, ok


def add_features(state: SlamState, camera: Camera, config: SlamConfig,
                 cand_uv: jnp.ndarray, cand_desc: jnp.ndarray,
                 cand_valid: jnp.ndarray) -> SlamState:
    """Add up to C candidate measurements into free slots, batched.

    The reference adds sequentially (addFeaturesToStateAndCovariance,
    AddMapFeature.cpp:354-367), but the sequential result is available in
    closed form: each new feature's init Jacobian J1 only reads the camera
    pose block P[0:7, :], which no addition modifies, and the cross block
    between two new features c, d is J1_c P77 J1_d^T.  So the whole batch
    is three einsums plus scatters -- bit-identical to the sequential loop,
    with no O(C) chain of N x N covariance copies.
    """
    Fslots = state.n_features
    dtype = state.P.dtype
    C = cand_uv.shape[0]
    N = state.P.shape[0]

    # Invalid candidates get an out-of-range slot so every scatter below
    # drops their updates (JAX default scatter mode discards OOB indices);
    # this also prevents index collisions with valid candidates.
    slots, ok = assign_slots(state.active, cand_valid)

    ekf = config.ekf
    camcal = config.camera
    cam7 = state.x[:7]
    rho0 = jnp.asarray(ekf.init_inv_depth_rho, dtype=dtype)

    # Steady-state tracking frames add nothing, but the init-Jacobian
    # vmapped chain + covariance einsums below cost ~100 us: branch the
    # WHOLE addition (Jacobians, covariance growth, state scatters) on
    # whether any candidate actually landed.  Identical math: with ok all
    # False every write below is a no-op.
    def _do_add(state):
        return _add_features_impl(state, camera, config, cand_uv, cand_desc,
                                  slots, ok)

    return jax.lax.cond(jnp.any(ok), _do_add, lambda s: s, state)


def add_features_at(state: SlamState, camera: Camera, config: SlamConfig,
                    cand_uv: jnp.ndarray, cand_desc: jnp.ndarray,
                    slots: jnp.ndarray, ok: jnp.ndarray) -> SlamState:
    """add_features with EXPLICIT slot placement (replay path).

    The injection-log replay must reproduce the recording run's slot
    layout even when this run's map-management decisions diverge from the
    recording's (e.g. reference_quirks on): measurements in the log are
    keyed by the recorder's slot ids.  ``slots`` gives each candidate's
    target slot; occupied targets are freed first (the oracle's collision
    rule, eval/oracle.py add_feature)."""
    Fslots = state.n_features
    colliding = jnp.zeros((Fslots,), bool).at[
        jnp.where(ok, slots, Fslots)].set(True, mode="drop")
    from openekfmonoslam_tpu.filter import mapman
    state = jax.lax.cond(
        jnp.any(colliding & state.active),
        lambda s: mapman.remove_features(s, colliding & s.active),
        lambda s: s, state)
    slots = jnp.where(ok, slots, Fslots).astype(jnp.int32)
    return jax.lax.cond(
        jnp.any(ok),
        lambda s: _add_features_impl(s, camera, config, cand_uv, cand_desc,
                                     slots, ok),
        lambda s: s, state)


def _add_features_impl(state: SlamState, camera: Camera, config: SlamConfig,
                       cand_uv: jnp.ndarray, cand_desc: jnp.ndarray,
                       slots: jnp.ndarray, ok: jnp.ndarray) -> SlamState:
    dtype = state.P.dtype
    C = cand_uv.shape[0]
    N = state.P.shape[0]
    ekf = config.ekf
    camcal = config.camera
    cam7 = state.x[:7]
    rho0 = jnp.asarray(ekf.init_inv_depth_rho, dtype=dtype)

    def feat_and_jacs(uv):
        uv_rho = jnp.concatenate([uv, rho0[None]])
        f = init_feature(camera, cam7, uv_rho)
        J1 = jax.jacfwd(lambda c: init_feature(camera, c, uv_rho))(cam7)
        J2 = jax.jacfwd(
            lambda m: init_feature(camera, cam7, m))(uv_rho)
        return f, J1, J2

    from openekfmonoslam_tpu.ops.init_kernel import (
        init_chain_pallas, init_kernel_applicable)
    if config.init_kernel and init_kernel_applicable(dtype):
        # ONE Pallas launch with hand-derived Jacobians (the vmapped
        # jacfwd chain below compiles to ~100 tiny fusions; equivalence
        # locked by tests/test_update_kernel.py)
        feats, J1, J2 = init_chain_pallas(
            camera, cam7, cand_uv, float(ekf.init_inv_depth_rho))
    else:
        feats, J1, J2 = jax.vmap(feat_and_jacs)(cand_uv)
        # (C,6) (C,6,7) (C,6,3)

    r_add = jnp.asarray([camcal.pixel_error_x ** 2, camcal.pixel_error_y ** 2,
                         ekf.inverse_depth_rho_sd ** 2], dtype=dtype)

    P = state.P
    # The camera strip P[:7, :] is all this branch reads of P.  Read it
    # through an optimization barrier: the scan carry keeps P in the
    # column-major layout the update kernels prefer, and without the
    # barrier XLA's layout assignment resolved the row-slice by
    # TRANSPOSING ALL OF P -- hoisted out of the rare-path cond, so every
    # steady-state frame paid a 1.6 MB HBM->VMEM round-trip + transpose
    # (measured 68 us/frame of async slice DMAs on the round-5 trace).
    # The barrier pins the conflict to a (7, N) copy instead.
    p7 = jax.lax.optimization_barrier(jax.lax.slice(P, (0, 0), (7, N)))
    P77 = p7[:, :7]
    rows = jnp.einsum("cij,jn->cin", J1, p7)              # (C, 6, N)
    B = jnp.einsum("cij,jk->cik", J1, P77)                # (C, 6, 7)
    cross = jnp.einsum("cik,djk->cidj", B, J1)            # (C, 6, C, 6)
    noise = jnp.einsum("cik,k,cjk->cij", J2, r_add, J2)   # (C, 6, 6)

    # overwrite the columns of ``rows`` that land on other new slots with the
    # new-new cross blocks (those columns are zero in P pre-add).
    # Invalid candidates point past the end of the PADDED state (slot
    # Fslots would land inside the padding dims, which exist in P).
    dim_idx = (CAM_DIM + FEAT_DIM * slots[:, None]
               + jnp.arange(FEAT_DIM)[None, :])           # (C, 6)
    dim_idx = jnp.where(ok[:, None], dim_idx, N)
    ok_f = ok.astype(dtype)
    cross = cross * ok_f[None, None, :, None]             # mask invalid d
    rows = rows.at[:, :, dim_idx.reshape(-1)].set(
        cross.reshape(C, FEAT_DIM, C * FEAT_DIM))
    # own diagonal block gets the measurement noise term
    idx_c = jnp.arange(C)
    diag = (jnp.einsum("cik,cjk->cij", B, J1) + noise)    # (C, 6, 6)
    rows = rows.at[idx_c[:, None, None],
                   jnp.arange(FEAT_DIM)[None, :, None],
                   dim_idx[:, None, :]].set(diag)

    # P rows/cols are placed by an inverse index map + gather instead of a
    # scatter along the (possibly row-sharded) leading dim: each state dim
    # looks up which candidate row writes it (K = none; the invalid
    # candidates' sentinel N lands in the truncated extra bucket).
    # Bit-exact to the scatter -- indices are unique -- and partitions
    # with zero full-P communication (filter/shardable.py rationale).
    flat_idx = dim_idx.reshape(-1)                        # (C*6,)
    flat_rows = rows.reshape(C * FEAT_DIM, N)
    K = C * FEAT_DIM
    idx_map = jnp.full((N + 1,), K, jnp.int32).at[flat_idx].set(
        jnp.arange(K, dtype=jnp.int32))[:N]
    wrote = idx_map < K                                   # (N,)
    A_ext = jnp.concatenate([flat_rows, jnp.zeros((1, N), dtype)], axis=0)
    AT_ext = jnp.concatenate([flat_rows.T, jnp.zeros((N, 1), dtype)], axis=1)

    # The (N, N) row/col placement gathers below are rare-path work, but
    # XLA's latency scheduler hoisted them (plus full-P VMEM copies) out
    # of the cond into every steady-state frame (~25 us/frame on the
    # round-5 trace).  The barrier gives them a branch-local data
    # dependence the scheduler cannot move across; it is sharding- and
    # value-transparent.
    P, A_ext, AT_ext, idx_map = jax.lax.optimization_barrier(
        (P, A_ext, AT_ext, idx_map))
    Pn = jnp.where(wrote[:, None], A_ext[idx_map, :], P)
    P_new = jnp.where(wrote[None, :], AT_ext[:, idx_map], Pn)

    x_new = state.x.at[flat_idx].set(feats.reshape(-1))
    zeros_c = jnp.zeros((C,), jnp.int32)
    pose_rows = jnp.broadcast_to(cam7.astype(jnp.float32), (C, 7))
    # insertion stamp: candidate order within the frame preserves the
    # sequential addition order of the reference (AddMapFeature.cpp:354-367);
    # at most C candidates per frame makes frame*(C+1)+i globally monotonic
    births = (state.frame * jnp.int32(C + 1)
              + jnp.arange(C, dtype=jnp.int32))
    return state._replace(
        x=x_new,
        P=P_new,
        active=state.active.at[slots].set(True),
        is_xyz=state.is_xyz.at[slots].set(False),
        times_predicted=state.times_predicted.at[slots].set(zeros_c),
        times_matched=state.times_matched.at[slots].set(zeros_c),
        descriptors=state.descriptors.at[slots].set(cand_desc),
        patch_pose=state.patch_pose.at[slots].set(pose_rows),
        birth=state.birth.at[slots].set(births),
    )
