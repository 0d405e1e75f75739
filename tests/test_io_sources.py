"""IO tests: on-demand real-time source skipping and the HandMatching
reference-format YML loader + replay."""

import numpy as np
from PIL import Image

from openekfmonoslam_tpu.io.handmatching import load_hand_matches
from openekfmonoslam_tpu.io.sources import FileSequenceOnDemandSource


def write_frames(d, n):
    for i in range(1, n + 1):
        img = np.full((8, 8), i, np.uint8)
        Image.fromarray(img).save(d / f"{i:05d}.png")


class TestOnDemandSource:
    def test_skips_by_wall_clock(self, tmp_path):
        write_frames(tmp_path, 20)
        t = {"now": 0.0}

        def clock():
            return t["now"]

        src = FileSequenceOnDemandSource(str(tmp_path), 1, 20,
                                         frame_rate=10.0, clock=clock)
        it = iter(src)
        seen = [int(next(it)[0, 0])]
        t["now"] += 0.35          # 0.35 s at 10 fps -> skip 3
        seen.append(int(next(it)[0, 0]))
        t["now"] += 0.15          # skip 1 (off fp-boundary value)
        seen.append(int(next(it)[0, 0]))
        assert seen == [1, 4, 5]

    def test_fast_consumer_resees_frame(self, tmp_path):
        """Zero elapsed time -> same frame again (reference semantics,
        FileSequenceOnDemandImageGenerator.cpp:76)."""
        write_frames(tmp_path, 3)
        t = {"now": 0.0}
        src = FileSequenceOnDemandSource(str(tmp_path), 1, 3,
                                         frame_rate=10.0,
                                         clock=lambda: t["now"])
        it = iter(src)
        a = int(next(it)[0, 0])
        b = int(next(it)[0, 0])
        assert a == b == 1

    def test_ends_at_sequence_end(self, tmp_path):
        write_frames(tmp_path, 3)
        t = {"now": 0.0}

        def clock():
            t["now"] += 1.0       # 1 s per pull at 1 fps -> step 1
            return t["now"]

        src = FileSequenceOnDemandSource(str(tmp_path), 1, 3,
                                         frame_rate=1.0, clock=clock)
        assert len(list(src)) <= 3


HANDMATCH_YML = """%YAML:1.0
frame0:
   - { x: 120, y: 45 }
   - { x: -1, y: -1 }
   - { x: 30, y: 31 }
frame1: [ { x: 121, y: 44 }, { x: 5, y: 6 } ]
frame2:
   - { x: 0, y: 10 }
"""


class TestHandMatching:
    def test_load_reference_format(self, tmp_path):
        p = tmp_path / "hand.yml"
        p.write_text(HANDMATCH_YML)
        frames = load_hand_matches(str(p), max_features=4)
        assert len(frames) == 3
        z0, m0 = frames[0]
        assert m0.tolist() == [True, False, True, False]
        assert z0[0].tolist() == [120.0, 45.0]
        assert z0[2].tolist() == [30.0, 31.0]
        z1, m1 = frames[1]
        assert m1.tolist() == [True, True, False, False]
        assert z1[1].tolist() == [5.0, 6.0]
        # x == 0 is not a match (HandMatching.cpp:64)
        _, m2 = frames[2]
        assert not m2.any()

    def test_replay_through_filter(self, tmp_path, rng):
        """Replayed matches drive the injected filter step end-to-end."""
        import dataclasses

        import jax.numpy as jnp

        from openekfmonoslam_tpu.config import SlamConfig
        from openekfmonoslam_tpu.engine.step import SlamRuntime
        from openekfmonoslam_tpu.filter import features as feat_mod
        from openekfmonoslam_tpu.io.handmatching import replay

        cfg = SlamConfig(max_features=8, max_keypoints=32,
                         max_hypotheses=8, dtype="float64")
        rt = SlamRuntime(cfg)
        state = rt.make_initial_state()
        # bootstrap a few landmarks at known pixels
        uv = jnp.asarray(rng.uniform(100, 400, (8, 2)))
        desc = jnp.zeros((8, cfg.descriptor.width), jnp.uint32)
        valid = jnp.ones((8,), bool)
        state = feat_mod.add_features(state, rt.camera, cfg, uv, desc, valid)

        # hand matches = the same pixels, static camera
        lines = ["%YAML:1.0"]
        for f in range(3):
            entries = ", ".join(
                "{ x: %d, y: %d }" % (int(u), int(v)) for u, v in
                np.asarray(uv))
            lines.append(f"frame{f}: [ {entries} ]")
        p = tmp_path / "hand.yml"
        p.write_text("\n".join(lines))

        frames = load_hand_matches(str(p), cfg.max_features)
        state2, records = replay(rt, state, frames)
        assert len(records) == 3
        assert np.isfinite(np.asarray(state2.x)).all()
        assert int(records[-1].total_matches) == 8
        # static measurements at the predicted positions keep the camera
        # essentially at the origin
        assert float(jnp.linalg.norm(state2.x[:3])) < 0.02
