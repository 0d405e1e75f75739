"""Child process for the real-device smoke test (tests/test_tpu_smoke.py).

Runs the engine's jitted step for a few real s3 frames on the *default*
JAX platform (the parent strips the CPU override, so under the harness
this is the tunneled TPU) and prints one JSON line with the platform,
per-frame camera states, and match counts.
"""

import json
import sys

import jax

# in-process platform pin: the harness sitecustomize can override a
# JAX_PLATFORMS env var, so argv — not env — selects the backend here
if len(sys.argv) > 2 and sys.argv[2]:
    jax.config.update("jax_platforms", sys.argv[2])

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    platform = jax.devices()[0].platform

    import dataclasses

    from openekfmonoslam_tpu.config import auto_max_features, load_config
    from openekfmonoslam_tpu.engine.step import SlamRuntime
    from openekfmonoslam_tpu.io.sources import FileSequenceSource

    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    frames = np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, n_frames)))

    init_fn, step_fn = rt.jitted()
    state = init_fn(rt.make_initial_state(), jnp.asarray(frames[0]))
    xs, matches = [], []
    for t in range(1, n_frames):
        state, rec = step_fn(state, jnp.asarray(frames[t]))
        xs.append(np.asarray(rec.x_cam).tolist())
        matches.append(int(rec.total_matches))

    finite = bool(np.all(np.isfinite(np.asarray(state.x)))
                  and np.all(np.isfinite(np.asarray(state.P))))
    print(json.dumps({"platform": platform, "x_cam": xs,
                      "matches": matches, "finite": finite}))


if __name__ == "__main__":
    main()
