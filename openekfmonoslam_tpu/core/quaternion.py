"""Quaternion and rotation primitives, differentiable and branch-free.

Semantics follow the reference's EKFMath (Core/EKFMath.cpp): quaternions are
(w, x, y, z); ``to_rotation_matrix(q)`` is the camera-to-world rotation
R(q) (EKFMath.cpp:118-141); ``from_axis_angle`` is ``anglesToQuaternion``
(EKFMath.cpp:58-78) with the small-angle branch replaced by a numerically
safe series so the function is C^1 at zero and autodiff-friendly (the filter
differentiates through it to build the predict Jacobian F).
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-8


def from_axis_angle(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> unit quaternion (w, x, y, z).

    q = [cos(|v|/2), sin(|v|/2) * v/|v|], with a 2nd-order series for small
    |v| (replaces the EPSILON branch at EKFMath.cpp:62-68).
    """
    n2 = jnp.sum(v * v)
    # Guard the norm so the sqrt gradient is finite at v = 0.
    n_safe = jnp.sqrt(jnp.where(n2 < _SMALL**2, _SMALL**2, n2))
    half = 0.5 * n_safe
    sinc_half = jnp.where(
        n2 < _SMALL**2,
        0.5 - n2 / 48.0,                # sin(n/2)/n series
        jnp.sin(half) / n_safe,
    )
    w = jnp.where(n2 < _SMALL**2, 1.0 - n2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w[None], sinc_half * v]).astype(v.dtype)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (EKFMath.cpp:82-98)."""
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """R(q): rotates camera-frame vectors into the world frame.

    Matches quaternionToRotationMatrix (EKFMath.cpp:118-141); valid for any
    (not necessarily unit) quaternion, as in the reference, where the raw
    post-update quaternion briefly has non-unit norm.
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    return jnp.stack([
        jnp.stack([w2 + x2 - y2 - z2, 2 * (x * y - w * z), 2 * (z * x + w * y)]),
        jnp.stack([2 * (x * y + w * z), w2 - x2 + y2 - z2, 2 * (y * z - w * x)]),
        jnp.stack([2 * (z * x - w * y), 2 * (y * z + w * x), w2 - x2 - y2 + z2]),
    ])


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q)


def normalize_jacobian(q: jnp.ndarray) -> jnp.ndarray:
    """4x4 Jacobian of q -> q/|q| (Update.cpp:45-60).

    Used to push the post-update quaternion renormalization through the
    covariance (Update.cpp:303-317).
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    n2 = w * w + x * x + y * y + z * z
    a = n2 ** (-1.5)
    j = jnp.stack([
        jnp.stack([x * x + y * y + z * z, -w * x, -w * y, -w * z]),
        jnp.stack([-x * w, w * w + y * y + z * z, -x * y, -x * z]),
        jnp.stack([-y * w, -y * x, w * w + x * x + z * z, -y * z]),
        jnp.stack([-z * w, -z * x, -z * y, w * w + x * x + y * y]),
    ])
    return j * a


def to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> (roll, pitch, yaw) (EKFMath.cpp:355-365)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y)),
        jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0)),
        jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z)),
    ])


def directional_vector(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Unit ray from azimuth/elevation (EKFMath.cpp:145-152).

    m(theta, phi) = (cos(phi) sin(theta), -sin(phi), cos(phi) cos(theta)) --
    the inverse-depth parametrization's bearing vector (Civera convention:
    theta about the world y axis, phi elevation, camera looks along +z).
    """
    cosphi = jnp.cos(phi)
    return jnp.stack([
        cosphi * jnp.sin(theta),
        -jnp.sin(phi),
        cosphi * jnp.cos(theta),
    ])
