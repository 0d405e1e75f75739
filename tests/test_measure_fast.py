"""measure_fast (analytic SoA Jacobians) == measure (jacfwd) elementwise.

The SoA chain replaces vmapped jacfwd on the hot path purely for kernel
count; it must be the SAME derivative.  Checked over a cloud of random
camera poses and mixed XYZ / inverse-depth features, in float64 (tight)
and float32 (fp-noise bound), including behind-camera and near-axis
slots (the clamped/floored branches).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import CameraCalibration, SlamConfig
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter import measure as meas
from openekfmonoslam_tpu.filter import measure_fast as mf


def _camera(dtype):
    cal = CameraCalibration(
        pixels_x=640, pixels_y=480, fx=525.06, fy=524.24,
        cx=319.5, cy=239.5, k1=0.089, k2=-0.19,
        dx=0.00934, dy=0.00982, angular_vision_x=60.0,
        angular_vision_y=47.0)
    return Camera.from_calibration(cal, dtype)


def _random_scene(n, rng, dtype):
    r = rng.normal(scale=0.5, size=3)
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    cam7 = jnp.asarray(np.concatenate([r, q]), dtype)
    feats = np.zeros((n, 6))
    feats[:, 0:3] = rng.normal(scale=0.4, size=(n, 3))
    feats[:, 3] = rng.uniform(-2.5, 2.5, n)      # theta
    feats[:, 4] = rng.uniform(-1.2, 1.2, n)      # phi
    feats[:, 5] = rng.uniform(0.05, 3.0, n)      # rho
    is_xyz = rng.random(n) < 0.4
    # XYZ slots: put a real point in front-ish of the camera
    feats[is_xyz, 0:3] = r + rng.normal(scale=2.0, size=(int(is_xyz.sum()), 3))
    return cam7, jnp.asarray(feats, dtype), jnp.asarray(is_xyz)


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 5e-11),
                                       (jnp.float32, 2e-3)])
def test_analytic_matches_jacfwd(dtype, tol):
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(0)
    camera = _camera(dtype)
    for trial in range(4):
        cam7, feats, is_xyz = _random_scene(64, rng, dtype)
        uv_a, Hc_a, Hf_a = mf.measurements_with_jacobians(
            camera, cam7, feats, is_xyz)
        uv_j, Hc_j, Hf_j = jax.vmap(
            lambda f, x: meas._measure_with_jac(camera, cam7, f, x)
        )(feats, is_xyz)

        # compare only slots where the prediction is sane (the insane ones
        # are masked by the visibility gate in the engine); scale-aware
        p_cam = jax.vmap(
            lambda f, x: meas.point_in_camera_frame(cam7, f, x)
        )(feats, is_xyz)
        ok = (np.asarray(p_cam[:, 2] > 0.05)
              & (np.abs(np.asarray(uv_j)).max(-1) < 2000.0))
        assert ok.sum() >= 10

        def rel(a, b):
            a, b = np.asarray(a)[ok], np.asarray(b)[ok]
            scale = np.maximum(np.abs(b).max(), 1.0)
            return np.abs(a - b).max() / scale

        assert rel(uv_a, uv_j) < tol, trial
        assert rel(Hc_a, Hc_j) < tol, trial
        assert rel(Hf_a, Hf_j) < tol, trial


def test_prediction_pipeline_equivalence():
    """predict_measurements (full pipeline with masks + S) is unchanged
    by the analytic path on a real engine state."""
    jax.config.update("jax_enable_x64", True)
    from openekfmonoslam_tpu.engine.step import SlamRuntime
    from openekfmonoslam_tpu.io.sources import SlidingWindowSource

    rng = np.random.default_rng(5)
    img = np.zeros((240, 320), np.uint8)
    for _ in range(120):
        y, x = rng.integers(6, 234), rng.integers(6, 314)
        img[y - 2:y + 2, x - 2:x + 2] = rng.integers(80, 255)
    cfg = SlamConfig(max_features=24, max_keypoints=128, dtype="float64",
                     pad_state_to=128)
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(
            cfg.camera, pixels_x=320, pixels_y=240, cx=160.0, cy=120.0))
    rt = SlamRuntime(cfg)
    frames = [jnp.asarray(f) for f in SlidingWindowSource(
        img, (240, 320), step_xy=(0, 0), n_frames=4)]
    state = rt.make_initial_state()
    state = jax.jit(rt.init_step)(state, frames[0])
    for f in frames[1:]:
        state, _ = jax.jit(rt.step)(state, f)

    pred_fast = meas.predict_measurements(state, rt.camera)
    pred_jac = meas.predict_measurements(state, rt.camera,
                                         analytic=False)
    for name in ("uv", "Hc", "Hf", "S"):
        np.testing.assert_allclose(
            np.asarray(getattr(pred_fast, name)),
            np.asarray(getattr(pred_jac, name)), rtol=0, atol=1e-9,
            err_msg=name)
    np.testing.assert_array_equal(np.asarray(pred_fast.visible),
                                  np.asarray(pred_jac.visible))
