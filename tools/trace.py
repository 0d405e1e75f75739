"""Capture a jax.profiler device trace of the SLAM step.

The reference brackets its seven pipeline phases with a microsecond wall
timer (Timer.cpp:52-90, EKF.cpp:255-618).  The TPU build's phase times
come from tools/profile_scan.py (honest in-scan costs) and, for kernel-
level speed-of-light accounting, from this tool: it runs a short scan
under jax.profiler.trace and writes a TensorBoard/XPlane trace directory
(open with tensorboard --logdir <out> or xprof).

  python tools/trace.py [out_dir] [n_frames]
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.scan_runner import scan_frames
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.io.sources import FileSequenceSource


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "runs/trace"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    frames = jnp.asarray(np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, n + 1))))

    from functools import partial
    init_fn = jax.jit(rt.init_step)
    scan_fn = jax.jit(partial(scan_frames, rt))

    state = init_fn(rt.make_initial_state(), frames[0])
    state, _ = scan_fn(state, frames[1:])        # compile outside trace
    jax.block_until_ready(state.x)

    state = init_fn(rt.make_initial_state(), frames[0])
    with jax.profiler.trace(out):
        state, recs = scan_fn(state, frames[1:])
        jax.block_until_ready(state.x)
    print(f"trace written to {out} ({n} frames); "
          f"view: tensorboard --logdir {out}")


if __name__ == "__main__":
    main()
