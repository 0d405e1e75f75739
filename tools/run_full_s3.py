"""Full 720-frame s3 run on device; writes trajectory + summary."""

import json
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

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.scan_runner import scan_frames
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.eval import trajectory as ev
from openekfmonoslam_tpu.io.sources import FileSequenceSource

CHUNK = 64


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/s3_full"
    import os
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.perf_counter()
    frames = np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, 720)))
    print(f"loaded {len(frames)} frames in {time.perf_counter()-t0:.1f}s")

    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    init_fn = jax.jit(rt.init_step)
    scan_fn = jax.jit(partial(scan_frames, rt))

    state = init_fn(rt.make_initial_state(), jnp.asarray(frames[0]))
    rest = frames[1:]
    n_chunks = len(rest) // CHUNK
    t0 = time.perf_counter()
    rec_parts = []
    for i in range(n_chunks):
        state, rec = scan_fn(state, jnp.asarray(
            rest[i * CHUNK:(i + 1) * CHUNK]))
        rec_parts.append(jax.tree.map(np.asarray, rec))
    dt = time.perf_counter() - t0
    records = jax.tree.map(lambda *x: np.concatenate(x), *rec_parts)
    n = n_chunks * CHUNK
    print(f"{n} frames in {dt:.2f}s = {n/dt:.1f} fps (incl. compile)")

    summary = ev.summarize(records)
    summary["fps_incl_compile"] = n / dt
    print(json.dumps(summary, indent=2))

    np.save(f"{out_dir}/x_cam.npy", np.asarray(records.x_cam))
    np.save(f"{out_dir}/counts.npy", np.stack([
        np.asarray(records.total_matches), np.asarray(records.li_inliers),
        np.asarray(records.hi_inliers), np.asarray(records.n_active)]))
    with open(f"{out_dir}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)

    pos = ev.positions_from_records(records)
    sf = summary["scale_factor"]
    print("\ntrajectory (every 60 frames, scaled to meters):")
    for t in range(0, n, 60):
        p = pos[t] * sf
        print(f"  t={t+1:3d} r=({p[0]:+.4f}, {p[1]:+.4f}, {p[2]:+.4f}) m  "
              f"matches={records.total_matches[t]}")


if __name__ == "__main__":
    main()
