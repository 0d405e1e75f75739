"""Degenerate-input robustness: the engine must never emit NaN/Inf.

The reference has no handling for pathological frames (a black camera
cover, sensor saturation, pure noise, a hard scene cut) -- it simply
loses tracking.  A production engine must at minimum keep the filter
state finite through all of them and keep accepting frames.  These are
property-style checks on the full engine with a small config.
"""

import dataclasses

import numpy as np
import pytest

from openekfmonoslam_tpu.config import CameraCalibration, EKFParams, SlamConfig
from openekfmonoslam_tpu.engine.engine import SlamEngine


def small_cfg(**kw):
    cam = CameraCalibration(
        pixels_x=128, pixels_y=96, fx=100.0, fy=100.0, cx=64.0, cy=48.0,
        k1=-0.01, k2=0.001, dx=0.01, dy=0.01,
        angular_vision_x=45.0, angular_vision_y=35.0)
    ekf = EKFParams(min_matches_per_image=8,
                    detect_new_features_image_areas_divide_times=1)
    return SlamConfig(camera=cam, ekf=ekf, max_features=12, max_keypoints=64,
                      max_hypotheses=12,
                      detector=dataclasses.replace(SlamConfig().detector,
                                                   threshold=12.0), **kw)


def textured(rng):
    img = np.zeros((96, 128), np.uint8)
    for _ in range(50):
        y, x = rng.integers(5, 91), rng.integers(5, 123)
        img[y - 2:y + 2, x - 2:x + 2] = rng.integers(80, 255)
    return img


def assert_finite(eng):
    assert np.isfinite(np.asarray(eng.state.x)).all()
    assert np.isfinite(np.asarray(eng.state.P)).all()
    # the covariance stays symmetric PSD-ish (diag nonnegative)
    P = np.asarray(eng.state.P)
    assert (np.diag(P) >= -1e-6).all()


DEGENERATE = {
    "black": lambda rng: np.zeros((96, 128), np.uint8),
    "white": lambda rng: np.full((96, 128), 255, np.uint8),
    "noise": lambda rng: rng.integers(0, 255, (96, 128), dtype=np.uint8),
    "gradient": lambda rng: np.tile(
        np.linspace(0, 255, 128, dtype=np.uint8), (96, 1)),
    "checker_cut": lambda rng: np.kron(
        (np.indices((12, 16)).sum(0) % 2) * 255,
        np.ones((8, 8))).astype(np.uint8),
}


@pytest.mark.parametrize("kind", sorted(DEGENERATE))
def test_degenerate_frames_keep_state_finite(kind, rng):
    eng = SlamEngine(small_cfg())
    eng.init(textured(rng))
    eng.step(textured(rng))
    bad = DEGENERATE[kind](rng)
    for _ in range(3):
        eng.step(bad)
        assert_finite(eng)
    # the engine keeps accepting frames afterwards
    eng.step(textured(rng))
    assert_finite(eng)


def test_degenerate_bootstrap_then_recover(rng):
    """Even INIT on a featureless frame must not corrupt the filter; a
    textured scene afterwards bootstraps tracking (ordinary map
    management repopulates the empty map -- no relocalization needed --
    and matches recover above the loss threshold)."""
    eng = SlamEngine(small_cfg(), relocalize_after=2,
                     lost_matches_threshold=4)
    eng.init(np.zeros((96, 128), np.uint8))
    assert_finite(eng)
    tex = textured(rng)
    for _ in range(4):
        eng.step(tex)
        assert_finite(eng)
    assert eng.records[-1]["n_active"] > 0
    assert eng.records[-1]["total_matches"] >= 4


def test_random_noise_run_stays_finite(rng):
    """20 frames of pure sensor noise: matches come and go randomly, the
    filter must stay finite throughout (gates + masked algebra)."""
    eng = SlamEngine(small_cfg(), relocalize_after=3)
    eng.init(rng.integers(0, 255, (96, 128), dtype=np.uint8))
    for _ in range(20):
        eng.step(rng.integers(0, 255, (96, 128), dtype=np.uint8))
        assert_finite(eng)
