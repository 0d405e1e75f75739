"""Diagnose the sharded step's collectives: where does GSPMD insert
full-P all-gathers?  Dumps each all-gather's shape + op metadata (source
file:line of the op that produced it) on the virtual 8-device CPU mesh.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/sharding_diag.py
"""

import os
import re
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import CameraCalibration, EKFParams, SlamConfig
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.io.sources import SlidingWindowSource
from openekfmonoslam_tpu.parallel.sharding import (
    make_mesh, make_sharded_step, shard_state)


def churn_cfg():
    cam = CameraCalibration(
        pixels_x=160, pixels_y=120, fx=120.0, fy=120.0,
        cx=80.0, cy=60.0, k1=-0.01, k2=0.001, dx=0.01, dy=0.01,
        angular_vision_x=45.0, angular_vision_y=35.0)
    ekf = EKFParams(min_matches_per_image=14,
                    detect_new_features_image_areas_divide_times=1,
                    good_feature_matching_percent=0.6,
                    inverse_depth_linearity_index_threshold=3.0,
                    always_remove_unseen_map_features=True)
    return SlamConfig(camera=cam, ekf=ekf, max_features=24, max_keypoints=128,
                      dtype="float64", pad_state_to=128,
                      detector=dataclasses.replace(
                          SlamConfig().detector, threshold=12.0))


DBYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "u8": 1, "pred": 1,
          "bf16": 2, "f16": 2, "s64": 8, "u64": 8}


def payload_bytes(hlo: str) -> dict:
    """Collective payload accounting per collective kind (result shapes)."""
    out = {}
    for name in ("all-gather", "all-reduce", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        total = count = 0
        for m in re.finditer(rf"(\w+)\[([0-9,]*)\][^\n]*{name}\(", hlo):
            ty, dims = m.group(1), m.group(2)
            if ty not in DBYTES:
                continue
            sz = 1
            for d in dims.split(","):
                if d:
                    sz *= int(d)
            total += sz * DBYTES[ty]
            count += 1
        out[name] = (count, total)
    return out


def analyze(cfg, label, verbose=False):
    rt = SlamRuntime(cfg)
    mesh = make_mesh(jax.devices()[:8])
    state = shard_state(rt.make_initial_state(), mesh)
    img = np.zeros((cfg.camera.pixels_y, cfg.camera.pixels_x), np.uint8)
    frame = jnp.asarray(img)
    step_fn = make_sharded_step(rt, mesh)
    compiled = step_fn.lower(state, frame).compile()
    hlo = compiled.as_text()
    n = cfg.padded_state_dim

    full_p = len(re.findall(rf"all-gather[^\n]*f64\[{n},{n}\]", hlo))
    pay = payload_bytes(hlo)
    total = sum(v for _, v in pay.values())
    print(f"[{label}] N={n}  full-P gathers={full_p}  "
          f"collective payload={total:,} B "
          f"({total / (n * n * 8):.2f} x one P rebuild)")
    for k, (c, b) in sorted(pay.items(), key=lambda kv: -kv[1][1]):
        print(f"    {k:<20} count={c:<5} bytes={b:,}")

    if verbose:
        for line in hlo.splitlines():
            if "all-gather(" in line or "all-gather-start(" in line:
                shape = re.search(r"(f64|f32|s32|pred|u8|u32)\[[0-9,]*\]",
                                  line)
                meta = re.search(r'op_name="([^"]*)"', line)
                s = shape.group(0) if shape else "?"
                big = "  <-- FULL P" if f"[{n},{n}]" in s else ""
                print(f"  {s:<22} {(meta.group(1) if meta else '?')[:110]}"
                      f"{big}")
    return n, total, full_p


def main():
    verbose = "-v" in sys.argv
    small = churn_cfg()
    # the bench-shaped config: 96 slots -> state 589 -> padded 640,
    # 640x480 frames (the regime BASELINE's map-size scaling rows use)
    big = dataclasses.replace(
        small,
        camera=dataclasses.replace(small.camera, pixels_x=640, pixels_y=480,
                                   cx=320.0, cy=240.0),
        max_features=96, max_keypoints=256)
    rows = [analyze(small, "churn-small", verbose=verbose),
            analyze(big, "bench-shaped", verbose=verbose)]
    (n1, b1, _), (n2, b2, _) = rows
    # scaling exponent of payload vs N: < 2 means the budget is NOT
    # rebuilding P (which would scale as N^2)
    import math
    alpha = math.log(b2 / b1) / math.log(n2 / n1)
    print(f"payload scaling: bytes ~ N^{alpha:.2f} "
          f"(N^2 would mean replicated-P rebuilds)")


if __name__ == "__main__":
    main()
