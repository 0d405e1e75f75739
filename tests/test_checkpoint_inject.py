"""Checkpoint roundtrip, map reset, and the injected-measurement
(HandMatching-replay) filter harness."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.engine.checkpoint import (
    load_checkpoint,
    reset_map,
    save_checkpoint,
)
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.filter import features as feat_mod
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter.state import make_initial_state


@pytest.fixture(scope="module")
def cfg():
    return SlamConfig(max_features=12, dtype="float64",
                      ekf=dataclasses.replace(
                          SlamConfig().ekf, min_matches_per_image=8))


@pytest.fixture(scope="module")
def rt(cfg):
    return SlamRuntime(cfg)


def bootstrap_synthetic(rt, cfg, rng, n=10):
    """Initialize a map by injecting synthetic detections (no images)."""
    state = rt.make_initial_state()
    uv = jnp.asarray(rng.uniform([80, 60], [560, 420], size=(n, 2)))
    desc = jnp.asarray(
        rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32))
    state = feat_mod.add_features(state, rt.camera, cfg, uv, desc,
                                  jnp.ones((n,), bool))
    return state, np.asarray(uv)


class TestInjectedStep:
    def test_static_camera_converges(self, rt, cfg, rng):
        """Injecting the predicted projections as measurements keeps the
        camera still and healthy for many steps."""
        state, uv0 = bootstrap_synthetic(rt, cfg, rng)
        step = jax.jit(rt.step_injected)
        for _ in range(15):
            pred = meas_mod.predict_measurements(state, rt.camera)
            state, rec = step(state, pred.uv, pred.visible)
        assert np.all(np.isfinite(np.asarray(state.x)))
        # camera stays ~put when measurements match predictions exactly
        assert np.linalg.norm(np.asarray(state.x[0:3])) < 0.05
        assert int(rec.li_inliers) + int(rec.hi_inliers) >= 8

    def test_shifted_measurements_move_camera(self, rt, cfg, rng):
        """Uniform +x pixel shift of all measurements (content moving
        right) must produce lateral camera motion."""
        state, _ = bootstrap_synthetic(rt, cfg, rng)
        step = jax.jit(rt.step_injected)
        for _ in range(10):
            pred = meas_mod.predict_measurements(state, rt.camera)
            z = pred.uv + jnp.asarray([2.0, 0.0])
            state, rec = step(state, z, pred.visible)
        r = np.asarray(state.x[0:3])
        assert abs(r[0]) > 1e-3
        assert abs(r[0]) > 5 * abs(r[1])


class TestCheckpoint:
    def test_roundtrip_bitexact(self, rt, cfg, rng, tmp_path):
        state, _ = bootstrap_synthetic(rt, cfg, rng)
        step = jax.jit(rt.step_injected)
        pred = meas_mod.predict_measurements(state, rt.camera)
        state, _ = step(state, pred.uv, pred.visible)

        path = os.path.join(tmp_path, "ckpt.npz")
        save_checkpoint(path, state)
        restored = load_checkpoint(path, like=rt.make_initial_state())

        for f in state._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(state, f)),
                np.asarray(getattr(restored, f)), err_msg=f)

        # continued runs are bit-identical
        pred_a = meas_mod.predict_measurements(state, rt.camera)
        a, _ = step(state, pred_a.uv, pred_a.visible)
        pred_b = meas_mod.predict_measurements(restored, rt.camera)
        b, _ = step(restored, pred_b.uv, pred_b.visible)
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        np.testing.assert_array_equal(np.asarray(a.P), np.asarray(b.P))

    def test_shape_mismatch_rejected(self, rt, cfg, rng, tmp_path):
        state, _ = bootstrap_synthetic(rt, cfg, rng)
        path = os.path.join(tmp_path, "ckpt.npz")
        save_checkpoint(path, state)
        other = make_initial_state(
            dataclasses.replace(cfg, max_features=24), dtype=jnp.float64)
        with pytest.raises(ValueError, match="shape"):
            load_checkpoint(path, like=other)


class TestResetMap:
    def test_reset_keeps_pose_drops_map(self, rt, cfg, rng):
        state, _ = bootstrap_synthetic(rt, cfg, rng)
        x = np.asarray(state.x).copy()
        x[0:3] = [0.5, -0.2, 0.1]
        x[3:7] = np.asarray(quat.from_axis_angle(
            jnp.asarray([0.1, 0.2, 0.0])))
        state = state._replace(x=jnp.asarray(x), frame=jnp.int32(42))

        fresh = rt.make_initial_state()
        reset = reset_map(state, fresh)
        np.testing.assert_array_equal(np.asarray(reset.x[:13]),
                                      np.asarray(state.x[:13]))
        assert not np.asarray(reset.active).any()
        assert int(reset.frame) == 42
        np.testing.assert_array_equal(np.asarray(reset.P),
                                      np.asarray(fresh.P))


def test_old_checkpoint_without_new_fields_loads(tmp_path):
    """Checkpoints written before a SlamState field existed (e.g. the
    round-3 patch_pose) still load: missing fields fill from ``like``."""
    import numpy as np

    from openekfmonoslam_tpu.config import SlamConfig
    from openekfmonoslam_tpu.engine.checkpoint import (load_checkpoint,
                                                       save_checkpoint)
    from openekfmonoslam_tpu.engine.step import SlamRuntime

    rt = SlamRuntime(SlamConfig(max_features=8, max_keypoints=32))
    state = rt.make_initial_state()
    path = tmp_path / "ck.npz"
    save_checkpoint(str(path), state)

    # rewrite the file WITHOUT patch_pose (simulating an old checkpoint)
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files if k != "patch_pose"}
    np.savez_compressed(path, **arrays)

    like = rt.make_initial_state()
    loaded = load_checkpoint(str(path), like)
    np.testing.assert_array_equal(np.asarray(loaded.x), np.asarray(state.x))
    np.testing.assert_array_equal(np.asarray(loaded.patch_pose),
                                  np.asarray(like.patch_pose))
