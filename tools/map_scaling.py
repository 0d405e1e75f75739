"""Single-chip frame time vs state dimension (the t(N) curve).

Measures the BASELINE.md map-size scaling row: device-resident scans on
real s3 frames at increasing max_features, reporting ms/frame.  The
quadratic fit of these points is the P-term of the sharded-step
efficiency model (BASELINE.md "Sharded-step communication model"), so
round 5 extends the measured range into the claimed P-dominated regime
(N ~ 8k-16k dims) instead of extrapolating the N<=1664 fit 18x.

Run: python tools/map_scaling.py [--quick]
Writes runs/map_scaling/summary.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
from functools import partial

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import load_config
from openekfmonoslam_tpu.engine.scan_runner import scan_frames
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.io.sources import FileSequenceSource

# (max_features, frames-per-timed-scan): bigger maps need fewer frames
SIZES = [(96, 64), (168, 64), (275, 64), (680, 32), (1360, 16),
         (2707, 8)]


def main():
    quick = "--quick" in sys.argv
    sizes = SIZES[:4] if quick else SIZES
    frames_all = jnp.asarray(np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, 66))))
    rows = []
    for mf, nf in sizes:
        cfg = load_config("/root/reference/experiments/s3/config.yml")
        cfg = dataclasses.replace(cfg, max_features=mf)
        n = cfg.padded_state_dim
        rt = SlamRuntime(cfg)
        init_fn = jax.jit(rt.init_step)
        scan_fn = jax.jit(partial(scan_frames, rt))
        frames = frames_all[:nf + 1]
        state = init_fn(rt.make_initial_state(), frames[0])
        state, _ = scan_fn(state, frames[1:])
        jax.block_until_ready(state.x)
        ts = []
        for _ in range(3):
            s0 = init_fn(rt.make_initial_state(), frames[0])
            t0 = time.perf_counter()
            s1, _ = scan_fn(s0, frames[1:])
            jax.block_until_ready(s1.x)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / nf * 1e3
        print(f"max_features={mf:<5} N={n:<6} {ms:8.3f} ms/frame "
              f"({nf}-frame scan)")
        rows.append(dict(max_features=mf, n=n, ms_per_frame=ms,
                         frames=nf))
    # quadratic fit t(N) = a + b N^2
    ns = np.array([r["n"] for r in rows], float)
    ts = np.array([r["ms_per_frame"] for r in rows], float)
    A = np.stack([np.ones_like(ns), ns ** 2], axis=1)
    coef, *_ = np.linalg.lstsq(A, ts, rcond=None)
    fit = dict(a_ms=float(coef[0]), b_ms_per_n2=float(coef[1]))
    print(f"fit: t(N) ~= {coef[0]:.3f} ms + {coef[1]:.3e} ms * N^2")
    for r in rows:
        pred = coef[0] + coef[1] * r["n"] ** 2
        print(f"  N={r['n']:<6} measured {r['ms_per_frame']:8.3f} "
              f"fit {pred:8.3f}")
    os.makedirs("runs/map_scaling", exist_ok=True)
    with open("runs/map_scaling/summary.json", "w") as f:
        json.dump(dict(rows=rows, fit=fit,
                       device=str(jax.devices()[0])), f, indent=2)
    print("wrote runs/map_scaling/summary.json")


if __name__ == "__main__":
    main()
