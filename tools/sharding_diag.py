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


def main():
    cfg = churn_cfg()
    rt = SlamRuntime(cfg)
    mesh = make_mesh(jax.devices()[:8])
    state = shard_state(rt.make_initial_state(), mesh)
    img = np.zeros((120, 160), np.uint8)
    frame = jnp.asarray(img)
    step_fn = make_sharded_step(rt, mesh)
    compiled = step_fn.lower(state, frame).compile()
    hlo = compiled.as_text()
    n = cfg.padded_state_dim

    # every all-gather line, with shape and metadata
    gathers = []
    for line in hlo.splitlines():
        if "all-gather(" in line or "all-gather-start(" in line:
            shape = re.search(r"(f64|f32|s32|pred|u8|u32)\[[0-9,]*\]", line)
            meta = re.search(r'op_name="([^"]*)"', line)
            src = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
            gathers.append((shape.group(0) if shape else "?",
                            meta.group(1) if meta else "?",
                            f"{src.group(1)}:{src.group(2)}" if src else "?"))
    print(f"total all-gathers: {len(gathers)} (state dim {n})")
    for s, m, src in gathers:
        big = "  <-- FULL P" if f"[{n},{n}]" in s else ""
        print(f"  {s:<22} {src:<60} {m[:110]}{big}")

    for name in ("all-reduce", "reduce-scatter", "collective-permute",
                 "all-to-all", "dynamic-slice(", "dynamic-update-slice("):
        c = len(re.findall(rf"{re.escape(name)}", hlo))
        print(f"{name}: {c}")


if __name__ == "__main__":
    main()
