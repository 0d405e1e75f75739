"""Unit tests for quaternion and camera primitives vs reference formulas
and finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import CameraCalibration
from openekfmonoslam_tpu.core import camera as cam_mod
from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.core.camera import Camera


def ref_quat_from_axis_angle(v):
    """anglesToQuaternion (EKFMath.cpp:58-78), NumPy transcription for test."""
    n = np.linalg.norm(v)
    if n < 2.22e-16:
        return np.array([1.0, 0, 0, 0])
    s = np.sin(n / 2)
    return np.array([np.cos(n / 2), s * v[0] / n, s * v[1] / n, s * v[2] / n])


def ref_rotation_matrix(q):
    """quaternionToRotationMatrix (EKFMath.cpp:118-141)."""
    r, x, y, z = q
    return np.array([
        [r*r + x*x - y*y - z*z, 2*(x*y - r*z), 2*(z*x + r*y)],
        [2*(x*y + r*z), r*r - x*x + y*y - z*z, 2*(y*z - r*x)],
        [2*(z*x - r*y), 2*(y*z + r*x), r*r - x*x - y*y + z*z],
    ])


class TestQuaternion:
    def test_from_axis_angle_matches_reference(self, rng):
        for _ in range(20):
            v = rng.normal(size=3)
            got = np.asarray(quat.from_axis_angle(jnp.asarray(v)))
            want = ref_quat_from_axis_angle(v)
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_from_axis_angle_small_angle(self):
        v = jnp.asarray([1e-12, -2e-12, 1e-13])
        q = quat.from_axis_angle(v)
        np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-11)
        # differentiable at ~zero
        J = jax.jacfwd(quat.from_axis_angle)(v)
        assert np.all(np.isfinite(np.asarray(J)))
        np.testing.assert_allclose(np.asarray(J)[1:, :], 0.5 * np.eye(3),
                                   atol=1e-9)

    def test_multiply_matches_reference(self, rng):
        q1 = rng.normal(size=4)
        q2 = rng.normal(size=4)
        got = np.asarray(quat.multiply(jnp.asarray(q1), jnp.asarray(q2)))
        # multiplyQuaternions (EKFMath.cpp:82-98)
        w1, x1, y1, z1 = q1
        w2, x2, y2, z2 = q2
        want = np.array([
            w1*w2 - x1*x2 - y1*y2 - z1*z2,
            w1*x2 + x1*w2 + y1*z2 - z1*y2,
            w1*y2 - x1*z2 + y1*w2 + z1*x2,
            w1*z2 + x1*y2 - y1*x2 + z1*w2,
        ])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rotation_matrix(self, rng):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        got = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(got, ref_rotation_matrix(q), atol=1e-12)
        # orthonormal for unit quaternions
        np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-12)

    def test_rotation_roundtrip(self, rng):
        v = rng.normal(size=3) * 0.3
        q = quat.from_axis_angle(jnp.asarray(v))
        R = quat.to_rotation_matrix(q)
        p = jnp.asarray(rng.normal(size=3))
        # rotating by q then q* returns the original
        np.testing.assert_allclose(np.asarray(R.T @ (R @ p)), np.asarray(p),
                                   atol=1e-12)

    def test_normalize_jacobian_vs_autodiff(self, rng):
        q = jnp.asarray(rng.normal(size=4))
        got = np.asarray(quat.normalize_jacobian(q))
        want = np.asarray(jax.jacfwd(lambda q: q / jnp.linalg.norm(q))(q))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_directional_vector(self):
        # theta=0, phi=0 looks along +z (EKFMath.cpp:145-152)
        m = np.asarray(quat.directional_vector(jnp.asarray(0.0),
                                               jnp.asarray(0.0)))
        np.testing.assert_allclose(m, [0, 0, 1], atol=1e-12)
        m = np.asarray(quat.directional_vector(jnp.asarray(np.pi / 2),
                                               jnp.asarray(0.0)))
        np.testing.assert_allclose(m, [1, 0, 0], atol=1e-12)


@pytest.fixture(scope="module")
def camera():
    return Camera.from_calibration(CameraCalibration(), dtype=jnp.float64)


class TestCamera:
    def test_project_backproject_roundtrip(self, camera, rng):
        uv = jnp.asarray([[320.0, 240.0], [100.0, 50.0], [600.0, 400.0]])
        rays = cam_mod.back_project(camera, uv)
        uv2 = cam_mod.project(camera, rays)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv),
                                   atol=1e-9)

    def test_distort_inverts_newton(self, camera):
        """distort solves r_u = r_d(1 + k1 r_d^2 + k2 r_d^4) exactly."""
        uv_u = jnp.asarray([[100.0, 80.0], [550.0, 430.0], [308.6, 236.5]])
        uv_d = cam_mod.distort(camera, uv_u)
        # invert analytically: metric radius relation
        for (xu, yu), (xd, yd) in zip(np.asarray(uv_u), np.asarray(uv_d)):
            mxd = float(camera.dx) * (xd - float(camera.cx))
            myd = float(camera.dy) * (yd - float(camera.cy))
            rd = np.hypot(mxd, myd)
            mxu = float(camera.dx) * (xu - float(camera.cx))
            myu = float(camera.dy) * (yu - float(camera.cy))
            ru = np.hypot(mxu, myu)
            lhs = rd * (1 + float(camera.k1) * rd**2 + float(camera.k2) * rd**4)
            np.testing.assert_allclose(lhs, ru, atol=1e-10)

    def test_undistort_one_shot(self, camera):
        """undistort matches the reference's forward polynomial
        (AddMapFeature.cpp:42-58)."""
        uv_d = jnp.asarray([150.0, 100.0])
        got = np.asarray(cam_mod.undistort(camera, uv_d))
        dx, dy = float(camera.dx), float(camera.dy)
        cx, cy = float(camera.cx), float(camera.cy)
        mx, my = dx * (150.0 - cx), dy * (100.0 - cy)
        r2 = mx * mx + my * my
        d = 1 + float(camera.k1) * r2 + float(camera.k2) * r2 * r2
        want = [cx + (150.0 - cx) * d, cy + (100.0 - cy) * d]
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_distort_jacobian_finite(self, camera):
        J = jax.jacfwd(lambda uv: cam_mod.distort(camera, uv))(
            jnp.asarray([308.649343121753361, 236.536005491807288]))
        assert np.all(np.isfinite(np.asarray(J)))

    def test_fov_gate(self, camera):
        assert bool(cam_mod.in_front_and_in_fov(
            camera, jnp.asarray([0.0, 0.0, 1.0])))
        assert not bool(cam_mod.in_front_and_in_fov(
            camera, jnp.asarray([0.0, 0.0, -1.0])))
        # 62.7 deg half-FOV in x: tan ~ 1.93
        assert bool(cam_mod.in_front_and_in_fov(
            camera, jnp.asarray([1.9, 0.0, 1.0])))
        assert not bool(cam_mod.in_front_and_in_fov(
            camera, jnp.asarray([2.0, 0.0, 1.0])))

    def test_in_image(self, camera):
        assert bool(cam_mod.in_image(camera, jnp.asarray([1.0, 1.0])))
        assert not bool(cam_mod.in_image(camera, jnp.asarray([-1.0, 10.0])))
        assert not bool(cam_mod.in_image(camera, jnp.asarray([641.0, 10.0])))
