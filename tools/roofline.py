"""Speed-of-light accounting for the per-frame step (VERDICT item 5).

Compiles the scanned step for the real device, pulls XLA's own cost
analysis (FLOPs + bytes accessed), sizes the compiled program (HLO
instruction / fusion counts), and compares the roofline bound
max(flops/peak, bytes/BW) against the measured per-frame time.

Peaks are v5e datasheet numbers; override with env if running elsewhere.
"""

import dataclasses
import os
import sys
import time
from functools import partial

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

# v5e: 394 TOPS int8 / 197 TFLOPS bf16; f32 "highest" runs 6 bf16 passes.
PEAK_BF16 = float(os.environ.get("PEAK_BF16_TFLOPS", 197)) * 1e12
HBM_BW = float(os.environ.get("HBM_GBPS", 819)) * 1e9
N_FRAMES = 64    # matches bench.py's chunk -> reuses its cached executable


def main():
    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    raw = np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, N_FRAMES + 1)))
    init_fn = jax.jit(rt.init_step)
    scan_fn = jax.jit(partial(scan_frames, rt))
    state = init_fn(rt.make_initial_state(), jnp.asarray(raw[0]))
    frames = jnp.asarray(raw[1:])

    print("lowering...", flush=True)
    lowered = scan_fn.lower(state, frames)
    print("compiling...", flush=True)
    compiled = lowered.compile()
    print("compiled.", flush=True)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    hlo = compiled.as_text()
    n_instr = hlo.count("\n")
    n_fusion = hlo.count(" fusion(")
    n_while = hlo.count(" while(")

    print("warmup run...", flush=True)
    out = scan_fn(state, frames)
    jax.block_until_ready(out[0].x)
    t0 = time.perf_counter()
    out = scan_fn(state, frames)
    jax.block_until_ready(out[0].x)
    wall = (time.perf_counter() - t0)
    per_frame = wall / N_FRAMES

    f_pf = flops / N_FRAMES
    b_pf = bytes_acc / N_FRAMES
    t_flops = f_pf / PEAK_BF16
    t_bytes = b_pf / HBM_BW
    bound = max(t_flops, t_bytes)
    print(f"per-frame: flops={f_pf/1e6:.1f} MF  bytes={b_pf/1e6:.2f} MB")
    print(f"roofline:  compute {t_flops*1e6:.1f} us | memory "
          f"{t_bytes*1e6:.1f} us  -> bound {bound*1e6:.1f} us "
          f"({'memory' if t_bytes > t_flops else 'compute'})")
    print(f"measured:  {per_frame*1e6:.1f} us/frame  "
          f"({per_frame/bound:.1f}x off the roofline)")
    print(f"program:   ~{n_instr} HLO lines, {n_fusion} fusions, "
          f"{n_while} while loops in the step body")
    print("interpretation: the residual is sequential small-kernel latency"
          " (hundreds of sub-128x128 ops per frame), not FLOPs or HBM.")


if __name__ == "__main__":
    main()
