"""Trajectory-quality eval on the straight s3 run: lateral drift % of travel.

The s3 ground truth is a straight sideways translation at constant speed,
so cross-track displacement relative to distance travelled is the
quality metric (BASELINE.md rows).  Runs the device-resident scan.

Usage: python tools/eval_drift.py [n_frames] [matcher]
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.scan_runner import run_sequence_on_device
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.io.sources import FileSequenceSource


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    matcher = sys.argv[2] if len(sys.argv) > 2 else "descriptor"
    # optional overrides: key=value pairs for SlamConfig fields
    overrides = {}
    for a in sys.argv[3:]:
        k, v = a.split("=")
        overrides[k] = (v == "True") if v in ("True", "False") else (
            float(v) if "." in v else int(v))

    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    if matcher == "ncc":
        cfg = dataclasses.replace(
            cfg, matcher="ncc",
            descriptor=dataclasses.replace(cfg.descriptor, kind="PATCH"))
    if "pixel_error" in overrides:
        pe = overrides.pop("pixel_error")
        cfg = dataclasses.replace(cfg, camera=dataclasses.replace(
            cfg.camera, pixel_error_x=float(pe), pixel_error_y=float(pe)))
        print("pixel_error:", pe)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
        print("overrides:", overrides)
    rt = SlamRuntime(cfg)
    frames = np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, n)))

    state, recs = run_sequence_on_device(rt, frames, chunk=64)
    x = recs.x_cam                          # (T, 13)
    matches = recs.total_matches
    travel = float(np.abs(x[-1, 0]))
    ymax = float(np.abs(x[:, 1]).max())
    zmax = float(np.abs(x[:, 2]).max())
    print(f"frames={n} matcher={matcher}")
    print(f"travel |x|={travel:.4f}  |y|max={ymax:.4f} "
          f"({100*ymax/travel:.2f}% of travel)  |z|max={zmax:.4f} "
          f"({100*zmax/travel:.2f}%)")
    print(f"matches: mean={matches.mean():.1f} min={int(matches.min())}")


if __name__ == "__main__":
    main()
