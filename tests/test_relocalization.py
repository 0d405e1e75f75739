"""Automatic relocalization: tracking loss triggers a map reset + re-init
from the live frame, keeping the camera pose; tracking then recovers."""

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.engine.engine import SlamEngine
from openekfmonoslam_tpu.vision import brief


def textured_big(rng):
    big = np.kron(rng.integers(0, 255, (40, 44)),
                  np.ones((4, 4))).astype(np.float32)
    return np.asarray(brief.smooth(jnp.asarray(big), 1.0))


class TestRelocalization:
    def test_reset_fires_and_recovers(self, rng):
        cfg = SlamConfig(max_features=12, max_keypoints=64,
                         max_hypotheses=12)
        eng = SlamEngine(cfg, relocalize_after=2, lost_matches_threshold=4)
        big = textured_big(rng)

        def frame(i):
            return big[20:140, 20 + i:148 + i]

        flat = np.full((120, 128), 128.0, np.float32)  # featureless

        eng.init(frame(0))
        eng.step(frame(1))
        assert eng.records[-1]["total_matches"] > 0
        pose_before = np.asarray(eng.state.x[:3]).copy()

        # featureless frames -> tracking lost -> relocalization on the 2nd
        eng.step(flat)
        assert eng.relocalizations == 0
        eng.step(flat)
        assert eng.relocalizations == 1
        assert eng.records[-1].get("relocalized")
        # pose preserved through the reset
        np.testing.assert_allclose(np.asarray(eng.state.x[:3]),
                                   pose_before, atol=0.05)

        # back to texture: the map was re-bootstrapped (from the flat
        # frame it found nothing; the next textured init-cycle will);
        # engine keeps running without exceptions and stays finite
        for i in range(2, 5):
            eng.step(frame(i))
            assert np.isfinite(np.asarray(eng.state.x)).all()

    def test_disabled_by_default(self, rng):
        cfg = SlamConfig(max_features=12, max_keypoints=64,
                         max_hypotheses=12)
        eng = SlamEngine(cfg)
        big = textured_big(rng)
        eng.init(big[20:140, 20:148])
        flat = np.full((120, 128), 128.0, np.float32)
        for _ in range(4):
            eng.step(flat)
        assert eng.relocalizations == 0
