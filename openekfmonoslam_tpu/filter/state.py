"""Slot-based filter state: static shapes for XLA.

The reference grows and shrinks a dense covariance as landmarks come and go
(AddMapFeature.cpp:221-289, MapManagement.cpp:168-259).  XLA wants fixed
shapes, so the TPU build preallocates ``max_features`` 6-wide feature slots:

  state vector x (N,)   N = 13 + 6*max_features
    x[0:3]   r    camera position (world)
    x[3:7]   q    orientation quaternion (w,x,y,z), camera-to-world
    x[7:10]  v    linear velocity
    x[10:13] w    angular velocity
    x[13+6i : 19+6i]  feature slot i:
       inverse-depth: (x, y, z, theta, phi, rho)   [anchor + bearing + rho]
       converted XYZ: (x, y, z, 0, 0, 0)           [last 3 dims retired]

  covariance P (N, N) with the invariant that rows/columns of *inactive*
  dims (empty slots, retired dims of XYZ features) are exactly zero.  Under
  that invariant the masked dense update equals the reference's compacted
  update exactly: H has zero columns there, so K = P H^T S^-1 has zero rows
  there, and (I - K H) P preserves the zeros.  Add/remove/convert are masked
  writes, never reshapes.

Feature metadata lives next to the state as fixed-size arrays (the
reference's MapFeature fields, MapFeature.h:62-77).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.config import SlamConfig

CAM_DIM = 13
FEAT_DIM = 6


class SlamState(NamedTuple):
    """The jit-carried filter state (a pytree)."""

    x: jnp.ndarray               # (N,) state vector
    P: jnp.ndarray               # (N, N) covariance
    active: jnp.ndarray          # (F,) bool: slot holds a live landmark
    is_xyz: jnp.ndarray          # (F,) bool: converted to XYZ parametrization
    times_predicted: jnp.ndarray  # (F,) int32
    times_matched: jnp.ndarray    # (F,) int32
    descriptors: jnp.ndarray     # (F, W) uint32 packed binary descriptors
    patch_pose: jnp.ndarray      # (F, 7) f32 camera (r, q) at template
    #                              capture -- the NCC active-search warp
    #                              anchor (zero q = no template stored)
    birth: jnp.ndarray           # (F,) int32 monotonic insertion stamp --
    #                              sorting active slots by it recovers the
    #                              reference's mapFeatures (insertion) order,
    #                              which its sequential RANSAC visit and
    #                              one-per-frame conversion scan depend on
    #                              (1PointRansac.cpp:125-186,
    #                              MapManagement.cpp:494-523); used by the
    #                              reference_quirks parity mode
    rng: jnp.ndarray             # jax PRNG key
    frame: jnp.ndarray           # () int32 step counter (EKF._ekfSteps)

    @property
    def n_features(self) -> int:
        return self.active.shape[0]

    @property
    def r(self) -> jnp.ndarray:
        return self.x[0:3]

    @property
    def q(self) -> jnp.ndarray:
        return self.x[3:7]

    @property
    def v(self) -> jnp.ndarray:
        return self.x[7:10]

    @property
    def w(self) -> jnp.ndarray:
        return self.x[10:13]

    @property
    def features(self) -> jnp.ndarray:
        """(F, 6) feature slot parameters (excludes padding dims)."""
        f = self.active.shape[0]
        return self.x[CAM_DIM:CAM_DIM + f * FEAT_DIM].reshape(-1, FEAT_DIM)


def slot_offsets(n_features: int) -> jnp.ndarray:
    """(F,) covariance row offset of each slot."""
    return CAM_DIM + FEAT_DIM * jnp.arange(n_features)


def dim_active_mask(state: SlamState) -> jnp.ndarray:
    """(N,) bool: which state dims are live.

    Camera dims always; slot dims when the slot is active, minus the retired
    3 dims of converted-XYZ slots; trailing padding dims never.
    """
    f = state.n_features
    n = state.x.shape[0]
    cam = jnp.ones((CAM_DIM,), dtype=bool)
    # per-slot dim pattern: inverse-depth all 6; xyz first 3 only
    first3 = jnp.arange(FEAT_DIM) < 3
    per_slot = jnp.where(state.is_xyz[:, None], first3[None, :],
                         jnp.ones((FEAT_DIM,), dtype=bool)[None, :])
    per_slot = per_slot & state.active[:, None]
    pad = jnp.zeros((n - CAM_DIM - f * FEAT_DIM,), dtype=bool)
    return jnp.concatenate([cam, per_slot.reshape(f * FEAT_DIM), pad])


def make_initial_state(config: SlamConfig, dtype=jnp.float32) -> SlamState:
    """Bootstrap state and covariance (CommonFunctions.cpp:39-80).

    r = 0, q = identity, v = 0, w = EPSILON (the reference seeds the angular
    velocity at machine epsilon to keep its |w| != 0 branch alive,
    CommonFunctions.cpp:52-54; harmless here, kept for parity).  P starts
    with EPSILON on the pose block diagonal and the squared initial
    accel SDs on the velocity blocks.
    """
    n = config.padded_state_dim
    f = config.max_features
    eps = jnp.asarray(2.22e-16, dtype=dtype)

    x = jnp.zeros((n,), dtype=dtype)
    x = x.at[3].set(1.0)                     # q = (1,0,0,0)
    x = x.at[10:13].set(eps)

    diag = jnp.zeros((n,), dtype=dtype)
    diag = diag.at[0:7].set(eps)
    diag = diag.at[7:10].set(config.ekf.init_linear_accel_sd ** 2)
    diag = diag.at[10:13].set(config.ekf.init_angular_accel_sd ** 2)
    P = jnp.diag(diag)

    # storage spec follows the configured descriptor family: packed uint32
    # words for BRIEF/ORB, float32 lanes for the SURF/SIFT float path
    desc_words = config.descriptor.width
    desc_dtype = jnp.uint32 if config.descriptor.is_binary else jnp.float32
    return SlamState(
        x=x,
        P=P,
        active=jnp.zeros((f,), dtype=bool),
        is_xyz=jnp.zeros((f,), dtype=bool),
        times_predicted=jnp.zeros((f,), dtype=jnp.int32),
        times_matched=jnp.zeros((f,), dtype=jnp.int32),
        descriptors=jnp.zeros((f, desc_words), dtype=desc_dtype),
        patch_pose=jnp.zeros((f, 7), dtype=jnp.float32),
        birth=jnp.zeros((f,), dtype=jnp.int32),
        rng=jax.random.PRNGKey(config.seed),
        frame=jnp.int32(0),
    )


def zero_inactive(P: jnp.ndarray, dim_mask: jnp.ndarray) -> jnp.ndarray:
    """Re-assert the P-invariant: inactive rows/cols exactly zero."""
    m = dim_mask.astype(P.dtype)
    return P * m[:, None] * m[None, :]
