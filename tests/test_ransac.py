"""RANSAC + rescue behavior tests on a synthetic scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter import ransac as ransac_mod
from openekfmonoslam_tpu.filter import update as upd_mod

from tests.test_filter import make_populated_state


@pytest.fixture(scope="module")
def cfg():
    return SlamConfig(max_features=6, dtype="float64")


@pytest.fixture(scope="module")
def camera(cfg):
    return Camera.from_calibration(cfg.camera, dtype=jnp.float64)


def test_consensus_separates_outlier(cfg, camera, rng):
    """Matches at the predictions (inliers) plus one far-off outlier: the
    winning hypothesis's support must include the inliers and exclude the
    outlier."""
    state, _ = make_populated_state(cfg, camera, rng, n_active=5, n_xyz=1)
    pred = meas_mod.predict_measurements(state, camera)
    vis = np.asarray(pred.visible)
    assert vis.sum() >= 4

    z = np.asarray(pred.uv).copy()
    matched = vis.copy()
    # tiny noise consistent with the model
    z[matched] += rng.normal(size=(matched.sum(), 2)) * 0.05
    # one gross outlier
    outlier_slot = np.nonzero(matched)[0][-1]
    z[outlier_slot] += [40.0, -35.0]

    res = ransac_mod.ransac(
        state, pred, jnp.asarray(z), jnp.asarray(matched), camera,
        threshold=cfg.ekf.ransac_threshold_predict_distance,
        all_inliers_probability=cfg.ekf.ransac_all_inliers_probability,
        pixel_error=1.0, max_hypotheses=cfg.max_hypotheses)

    inl = np.asarray(res.inliers)
    out = np.asarray(res.outliers)
    assert not inl[outlier_slot]
    assert out[outlier_slot]
    assert inl.sum() >= matched.sum() - 2
    assert int(res.best_support) == inl.sum()


def test_no_matches(cfg, camera, rng):
    state, _ = make_populated_state(cfg, camera, rng)
    pred = meas_mod.predict_measurements(state, camera)
    z = jnp.zeros((cfg.max_features, 2), dtype=jnp.float64)
    matched = jnp.zeros(cfg.max_features, bool)
    res = ransac_mod.ransac(
        state, pred, z, matched, camera, 1.0, 0.99, 1.0, 96)
    assert not bool(np.asarray(res.inliers).any())
    assert not bool(np.asarray(res.outliers).any())


def test_rescue_recovers_consistent_outlier(cfg, camera, rng):
    """A match excluded by the tight RANSAC threshold but consistent under
    the chi2 gate must be rescued after the first update (EKF.cpp:68-119)."""
    state, _ = make_populated_state(cfg, camera, rng, n_active=5, n_xyz=1)
    pred = meas_mod.predict_measurements(state, camera)
    vis = np.asarray(pred.visible)
    z = np.asarray(pred.uv).copy()
    matched = vis.copy()
    z[matched] += rng.normal(size=(matched.sum(), 2)) * 0.05
    # moderately off: outside the 1px ransac threshold, inside chi2 gate
    mid_slot = np.nonzero(matched)[0][1]
    z[mid_slot] += [2.0, 1.5]

    res = ransac_mod.ransac(
        state, pred, jnp.asarray(z), jnp.asarray(matched), camera,
        1.0, 0.99, 1.0, 96)
    inl = np.asarray(res.inliers)
    assert not inl[mid_slot]

    st1 = upd_mod.update(state, pred, jnp.asarray(z), jnp.asarray(inl), 1.0)
    pred2 = meas_mod.predict_measurements(st1, camera)
    rescued = ransac_mod.rescue_outliers(
        pred2, jnp.asarray(z), res.outliers, cfg.ekf.ransac_chi2_threshold)
    assert bool(np.asarray(rescued)[mid_slot])


def test_update_pulls_state_toward_measurements(cfg, camera, rng):
    """End-to-end predict->update shrinks the innovation."""
    state, _ = make_populated_state(cfg, camera, rng, n_active=5, n_xyz=1)
    pred = meas_mod.predict_measurements(state, camera)
    vis = np.asarray(pred.visible)
    z = np.asarray(pred.uv) + np.where(vis[:, None], 1.5, 0.0)

    st1 = upd_mod.update(state, pred, jnp.asarray(z), jnp.asarray(vis), 1.0)
    pred1 = meas_mod.predict_measurements(st1, camera)
    before = np.linalg.norm((z - np.asarray(pred.uv))[vis])
    after = np.linalg.norm((z - np.asarray(pred1.uv))[vis])
    assert after < before * 0.7
