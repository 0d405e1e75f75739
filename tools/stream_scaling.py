"""Stream-DP aggregate throughput vs batch size on the real chip.

Measures the BASELINE.md stream-data-parallel row: B independent SLAM
streams per chip through parallel/batch_runner.batched_step (rare paths
gated at batch level), 64-frame scans over real s3 frames.

Run: python tools/stream_scaling.py [B ...]     (default 1 4 8 16)
192-frame scans: ONE scan call per timed pass so the tunneled client's
fixed dispatch latency stays amortized (same methodology as bench.py).
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.io.sources import FileSequenceSource
from openekfmonoslam_tpu.parallel.batch_runner import (batched_step,
                                                       make_batch_states,
                                                       make_batched_init)

T = 192


def main():
    bs = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]
    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    frames = np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, T + 1)))
    for B in bs:
        fb = jnp.asarray(np.broadcast_to(frames[None], (B,) + frames.shape))
        states = make_batch_states(rt, B, seeds=range(B))
        states = make_batched_init(rt)(states, fb[:, 0])
        frames_tb = jnp.swapaxes(fb[:, 1:], 0, 1)

        @jax.jit
        def run(states, frames_tb):
            def body(c, f):
                s, rec = batched_step(rt, c, f)
                return s, rec.x_cam
            return jax.lax.scan(body, states, frames_tb)

        out = run(states, frames_tb)
        jax.block_until_ready(out[0].x)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(states, frames_tb)
            jax.block_until_ready(out[0].x)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"B={B:2d}: {B * T / dt:7.1f} frames/s aggregate "
              f"({T / dt:6.1f} per stream)")


if __name__ == "__main__":
    main()
