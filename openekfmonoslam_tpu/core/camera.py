"""Differentiable pinhole camera with 2-term radial distortion.

The distortion model matches the reference exactly (it is the Civera MATLAB
convention): the radial polynomial operates on *metric* sensor coordinates,
obtained by scaling pixel offsets from the principal point by the pixel
pitch (dx, dy) in mm.

  * ``distort``  : undistorted pixel -> distorted pixel, by inverting
    r_u = r_d (1 + k1 r_d^2 + k2 r_d^4) with 10 Newton iterations
    (distortPoint_matlab, MeasurementPrediction.cpp:47-83).  This is the
    function used on the measurement-prediction path.
  * ``undistort``: distorted pixel -> undistorted pixel, by the one-shot
    forward polynomial (undistortPoint, AddMapFeature.cpp:42-58).  Used on
    the feature-initialization path.

(The pair are exact inverses of each other only to first order; the
reference commits to this asymmetry and so do we, for trajectory parity.)

All functions are pure jnp on the last axis = 2 and batch transparently
under vmap; H Jacobians are obtained by jax.jacfwd through these functions,
including through the unrolled Newton iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.config import CameraCalibration

_NEWTON_ITERS = 10


class Camera(NamedTuple):
    """Calibration constants as a pytree of scalars (jit-friendly)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    pixels_x: int
    pixels_y: int
    pixel_error_x: jnp.ndarray
    pixel_error_y: jnp.ndarray
    tan_vision_x: jnp.ndarray   # tan(angular_vision) FOV gates
    tan_vision_y: jnp.ndarray

    @classmethod
    def from_calibration(cls, calib: CameraCalibration, dtype=jnp.float32
                         ) -> "Camera":
        c = lambda v: jnp.asarray(v, dtype=dtype)  # noqa: E731
        return cls(
            fx=c(calib.fx), fy=c(calib.fy), cx=c(calib.cx), cy=c(calib.cy),
            k1=c(calib.k1), k2=c(calib.k2), dx=c(calib.dx), dy=c(calib.dy),
            pixels_x=int(calib.pixels_x), pixels_y=int(calib.pixels_y),
            pixel_error_x=c(calib.pixel_error_x),
            pixel_error_y=c(calib.pixel_error_y),
            tan_vision_x=c(jnp.tan(jnp.deg2rad(calib.angular_vision_x))),
            tan_vision_y=c(jnp.tan(jnp.deg2rad(calib.angular_vision_y))),
        )


def project(cam: Camera, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D point -> undistorted pixel (MeasurementPrediction.cpp:110-120)."""
    return jnp.stack([
        cam.cx + cam.fx * p_cam[..., 0] / p_cam[..., 2],
        cam.cy + cam.fy * p_cam[..., 1] / p_cam[..., 2],
    ], axis=-1)


def back_project(cam: Camera, uv_undist: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel -> unit-depth camera ray (AddMapFeature.cpp:313-315)."""
    return jnp.stack([
        (uv_undist[..., 0] - cam.cx) / cam.fx,
        (uv_undist[..., 1] - cam.cy) / cam.fy,
        jnp.ones_like(uv_undist[..., 0]),
    ], axis=-1)


def _metric_r2(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    mx = cam.dx * (uv[..., 0] - cam.cx)
    my = cam.dy * (uv[..., 1] - cam.cy)
    return mx * mx + my * my


def distort(cam: Camera, uv_undist: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel -> distorted pixel via Newton inversion.

    Follows distortPoint_matlab (MeasurementPrediction.cpp:47-83): solve
    r_d + k1 r_d^3 + k2 r_d^5 = r_u for the metric distorted radius, then
    divide the pixel offset by d = 1 + k1 r_d^2 + k2 r_d^4.  The 10
    iterations are unrolled so jacfwd differentiates through them.
    """
    du = uv_undist[..., 0] - cam.cx
    dv = uv_undist[..., 1] - cam.cy
    # Floor r^2 so the sqrt gradient is finite at the principal point
    # (value shift < 1e-6 mm, far below measurement noise).
    r2 = jnp.maximum(_metric_r2(cam, uv_undist), 1e-12)
    ru = jnp.sqrt(r2)
    rd = ru / (1.0 + cam.k1 * r2 + cam.k2 * r2 * r2)
    for _ in range(_NEWTON_ITERS):
        rd2 = rd * rd
        f = rd + cam.k1 * rd2 * rd + cam.k2 * rd2 * rd2 * rd - ru
        fp = 1.0 + 3.0 * cam.k1 * rd2 + 5.0 * cam.k2 * rd2 * rd2
        rd = rd - f / fp
    # Implicit differentiation: the converged root is wrapped in
    # stop_gradient and ONE differentiable Newton step is appended.  The
    # value is unchanged (the step's correction is ~0 at convergence; if
    # anything more converged) while jacfwd's tangents flow only through
    # this step -- d(rd)/d(ru) = 1/g'(rd) exactly as the implicit function
    # theorem gives -- instead of through all 10 unrolled iterations.
    rd_s = jax.lax.stop_gradient(rd)
    rd2s = rd_s * rd_s
    f = rd_s + cam.k1 * rd2s * rd_s + cam.k2 * rd2s * rd2s * rd_s - ru
    fp = 1.0 + 3.0 * cam.k1 * rd2s + 5.0 * cam.k2 * rd2s * rd2s
    rd = rd_s - f / fp
    rd2 = rd * rd
    d = 1.0 + cam.k1 * rd2 + cam.k2 * rd2 * rd2
    return jnp.stack([cam.cx + du / d, cam.cy + dv / d], axis=-1)


def undistort(cam: Camera, uv_dist: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel -> undistorted pixel (one-shot polynomial).

    Follows undistortPoint (AddMapFeature.cpp:42-58): multiply the pixel
    offset by 1 + k1 r_d^2 + k2 r_d^4 with r_d from the *distorted* point.
    """
    du = uv_dist[..., 0] - cam.cx
    dv = uv_dist[..., 1] - cam.cy
    r2 = _metric_r2(cam, uv_dist)
    d = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    return jnp.stack([cam.cx + du * d, cam.cy + dv * d], axis=-1)


def in_front_and_in_fov(cam: Camera, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Angular FOV gate (isInFrontOfCamera, MeasurementPrediction.cpp:162-171).

    The reference tests |atan2(x, z)| < angular_vision (degrees).  With the
    FOV below 90 degrees that is equivalent to z > 0 and |x| < z*tan(fov) --
    the form used here is branch-free and cheaper than atan2.
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    return ((z > 0)
            & (jnp.abs(x) < z * cam.tan_vision_x)
            & (jnp.abs(y) < z * cam.tan_vision_y))


def in_image(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Image-bounds gate (isVisibleInImageFrame, MeasurementPrediction.cpp:176-181)."""
    return ((uv[..., 0] > 0) & (uv[..., 0] < cam.pixels_x)
            & (uv[..., 1] > 0) & (uv[..., 1] < cam.pixels_y))
