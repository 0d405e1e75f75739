"""The canonical samples config and its full profile matrix (VERDICT r3 #7).

The reference's ConfigurationManager resolves one named profile per
subsystem out of kalmanFilter/samples/EKF/config.yml
(ConfigurationManager.cpp:74-111): 3 EKF parameter profiles, 6 detector
profiles, 3 extractor profiles, 3 camera calibrations.  These tests pin
that THE canonical file loads unchanged, that every profile combination
resolves to the right typed values, and that the engine runs end-to-end
under the default selection and an alternate detector profile.
"""

import dataclasses
import os
import re

import numpy as np
import pytest

from openekfmonoslam_tpu.config import load_config

SAMPLES = "/root/reference/kalmanFilter/samples/EKF/config.yml"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(SAMPLES), reason="reference samples config missing")


def _with_profiles(tmp_path, ekf=None, det=None, desc=None, cam=None):
    """Rewrite the RunConfiguration section's profile selections."""
    text = open(SAMPLES).read()
    for key, val in (("ExtendedKalmanFilter", ekf), ("FeatureDetector", det),
                     ("DescriptorExtractor", desc),
                     ("CameraCalibration", cam)):
        if val is not None:
            text = re.sub(rf'(  {key}: )"[^"]*"', rf'\1"{val}"', text,
                          count=1)
    p = tmp_path / "config.yml"
    p.write_text(text)
    return str(p)


def test_canonical_file_loads_with_default_selection():
    """RunConfiguration selects EKF / STAR / BRIEF / S3
    (samples/EKF/config.yml:34-38)."""
    cfg = load_config(SAMPLES)
    # EKF profile (config.yml:72-98)
    assert cfg.ekf.init_inv_depth_rho == pytest.approx(0.9)
    assert cfg.ekf.linear_accel_sd == pytest.approx(0.0005)
    assert cfg.ekf.angular_accel_sd == pytest.approx(0.00005)
    assert cfg.ekf.min_matches_per_image == 20
    assert cfg.ekf.max_map_size == 240
    assert cfg.ekf.detect_new_features_image_mask_ellipse_size == 5
    # detector / extractor profiles
    assert cfg.detector.kind == "STAR"
    assert cfg.descriptor.kind == "BRIEF"
    assert cfg.descriptor.n_bits == 256
    # S3 calibration (config.yml:162-176)
    assert cfg.camera.fx == pytest.approx(525.060143149240389)
    assert cfg.camera.pixels_x == 640
    assert cfg.camera.k1 == pytest.approx(-7.613e-3)


# every RunConfiguration profile named in the canonical file
EKF_PROFILES = {
    "EKF400ms": dict(linear_accel_sd=0.007, angular_accel_sd=0.009,
                     min_matches_per_image=20, max_map_size=240),
    "EKF": dict(linear_accel_sd=0.0005, angular_accel_sd=0.00005,
                min_matches_per_image=20, max_map_size=240),
    "MatlabEKF": dict(linear_accel_sd=0.007, angular_accel_sd=0.007,
                      min_matches_per_image=25, max_map_size=300),
}
DETECTOR_PROFILES = {
    "Fast": ("FAST", dict(threshold=50.0)),
    "MatlabFast": ("FAST", dict(threshold=150.0)),
    "SURF": ("SURF", {}),
    "SIFT": ("SIFT", {}),
    "ORB": ("ORB", {}),
    "STAR": ("STAR", {}),
}
DESCRIPTOR_PROFILES = {"SURF": "SURF", "ORB": "ORB", "BRIEF": "BRIEF"}
CAMERA_PROFILES = {
    "S3": dict(pixels_x=640, fx=525.060143149240389),
    "NexusOne": dict(pixels_x=720, fx=2490.730889603472860),
    "MatlabCam": dict(pixels_x=320, fx=194.0625),
}


def test_full_profile_matrix_resolves(tmp_path):
    """Every (EKF x camera) pair and every (detector x extractor) pair of
    the canonical file resolves to the documented typed values."""
    for ekf_name, want in EKF_PROFILES.items():
        for cam_name, cam_want in CAMERA_PROFILES.items():
            cfg = load_config(_with_profiles(
                tmp_path, ekf=ekf_name, cam=cam_name))
            for k, v in want.items():
                assert getattr(cfg.ekf, k) == pytest.approx(v), (
                    ekf_name, k)
            for k, v in cam_want.items():
                assert getattr(cfg.camera, k) == pytest.approx(v), (
                    cam_name, k)
    for det_name, (kind, det_want) in DETECTOR_PROFILES.items():
        for desc_name, desc_kind in DESCRIPTOR_PROFILES.items():
            cfg = load_config(_with_profiles(
                tmp_path, det=det_name, desc=desc_name))
            assert cfg.detector.kind == kind, det_name
            for k, v in det_want.items():
                assert getattr(cfg.detector, k) == pytest.approx(v)
            assert cfg.descriptor.kind == desc_kind


def _smoke(cfg, n_frames=3):
    import jax.numpy as jnp

    from openekfmonoslam_tpu.engine.step import SlamRuntime

    cfg = dataclasses.replace(cfg, max_features=16, max_keypoints=64,
                              max_hypotheses=16)
    rt = SlamRuntime(cfg)
    rng = np.random.default_rng(3)
    h, w = cfg.camera.pixels_y, cfg.camera.pixels_x
    state = rt.make_initial_state()
    init_fn, step_fn = rt.jitted()
    state = init_fn(state, jnp.asarray(
        rng.integers(0, 255, (h, w), np.uint8)))
    for _ in range(n_frames):
        state, rec = step_fn(state, jnp.asarray(
            rng.integers(0, 255, (h, w), np.uint8)))
    assert np.all(np.isfinite(np.asarray(state.x)))
    assert np.all(np.isfinite(np.asarray(state.P)))


def test_engine_smoke_under_default_selection():
    """3-frame engine run under the file's own RunConfiguration
    (EKF + STAR + BRIEF + S3) -- the reference sample app's setup
    (samples/EKF/main.cpp:50-69)."""
    _smoke(load_config(SAMPLES))


def test_engine_smoke_under_alternate_profiles(tmp_path):
    """3-frame engine run under a different selection from the same file
    (Fast detector + ORB extractor + MatlabCam calibration)."""
    _smoke(load_config(_with_profiles(
        tmp_path, ekf="MatlabEKF", det="Fast", desc="ORB",
        cam="MatlabCam")))
