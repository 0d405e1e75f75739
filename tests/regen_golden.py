"""Regenerate tests/golden_s3_20.npz after an INTENTIONAL behavior change.

Runs the exact setup of tests/test_golden_s3.py (CPU, float32 engine under
the x64-enabled test env) and overwrites the committed golden.  Run from
the repo root:

  python tests/regen_golden.py

then re-run pytest tests/test_golden_s3.py and commit the refreshed npz
together with the change that moved the trajectory.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import jax.numpy as jnp
import numpy as np

REF_FRAMES = "/root/reference/experiments/s3/costado_recto1"
REF_CONFIG = "/root/reference/experiments/s3/config.yml"
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden_s3_20.npz")


def main():
    from openekfmonoslam_tpu.config import auto_max_features, load_config
    from openekfmonoslam_tpu.engine.step import SlamRuntime
    from openekfmonoslam_tpu.io.sources import FileSequenceSource

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

    np.savez(GOLDEN, positions=np.asarray(pos),
             matches=np.asarray(matches, np.int32))
    print(f"wrote {GOLDEN}: matches={matches}")


if __name__ == "__main__":
    main()
