"""Golden regression: 20 real s3 frames against a committed trajectory.

Locks the end-to-end pipeline's behavior (STAR+BRIEF, the reference s3
config) across refactors: the per-frame camera positions must stay within
a small band of the committed run, and match counts must stay at healthy
tracking levels.  The band is loose enough to survive benign numeric
reorderings, tight enough to catch semantic changes (a lost frame of
tracking moves positions by >1e-2).

Regenerate after an *intentional* behavior change with:
  python tests/regen_golden.py   (see this file's generator in git history)
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF_FRAMES = "/root/reference/experiments/s3/costado_recto1"
REF_CONFIG = "/root/reference/experiments/s3/config.yml"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_s3_20.npz")


@pytest.mark.skipif(not os.path.isdir(REF_FRAMES),
                    reason="reference dataset not mounted")
def test_s3_trajectory_matches_golden():
    from openekfmonoslam_tpu.config import auto_max_features, load_config
    from openekfmonoslam_tpu.engine.step import SlamRuntime
    from openekfmonoslam_tpu.io.sources import FileSequenceSource

    golden = np.load(GOLDEN)
    cfg = load_config(REF_CONFIG)
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    frames = np.stack(list(FileSequenceSource(REF_FRAMES, 1, 21)))

    init_fn, step_fn = rt.jitted()
    s = init_fn(rt.make_initial_state(), jnp.asarray(frames[0]))
    pos, matches = [], []
    for t in range(1, 21):
        s, rec = step_fn(s, jnp.asarray(frames[t]))
        pos.append(np.asarray(rec.x_cam[:3]))
        matches.append(int(rec.total_matches))
    pos = np.asarray(pos)

    # tracking health: every frame keeps most of its 60-feature budget
    assert min(matches) >= 50, matches
    # trajectory band: millimeter-scale agreement with the committed run
    err = np.linalg.norm(pos - golden["positions"], axis=1)
    assert err.max() < 2e-3, (err.max(), pos[-1], golden["positions"][-1])
