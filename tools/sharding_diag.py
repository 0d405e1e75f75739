"""Collective-communication accounting for the sharded step, per device.

Compiles the P-sharded frame step on the virtual 8-device CPU mesh (1-D
row layout AND the 2-D (2, 4) row x col tiling) and accounts every
collective in the optimized HLO *per device*, using each op's replica
groups and the standard ring-algorithm traffic model:

    all-gather          result S, group g  ->  S (g-1)/g received/device
    reduce-scatter      operand S          ->  S (g-1)/g
    all-reduce          operand S          ->  2 S (g-1)/g  (RS + AG)
    all-to-all          per-device S       ->  S (g-1)/g
    collective-permute  S x |pairs| / D    (only paired devices receive)

This is exactly the accounting that needs NO multi-chip hardware: the
compiled program (shapes, replica groups) is identical on the virtual
mesh; only link bandwidth differs.  Collectives inside `cond` branches
(feature addition, conversion surgery -- rare frames) are tallied
separately from steady-state ones.

Run: python tools/sharding_diag.py            (both meshes, N=640)
     python tools/sharding_diag.py --big      (adds N=1664, slower compile)
     python tools/sharding_diag.py -v         (dump per-op lines)
Writes runs/sharding_diag/summary.json.
"""

import json
import os
import re
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import CameraCalibration, EKFParams, SlamConfig
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.parallel.sharding import (
    make_mesh, make_mesh_2d, make_sharded_step, make_sharded_step_2d,
    shard_state, shard_state_2d)

N_DEV = 8

DBYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "u8": 1, "pred": 1,
          "bf16": 2, "f16": 2, "s64": 8, "u64": 8, "s8": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
_KINDS = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
          "collective-permute")


def _shape_bytes(text: str) -> int:
    """Sum the byte sizes of every shape literal in ``text`` (handles
    tuple-shaped all-to-all results)."""
    total = 0
    for ty, dims in _SHAPE_RE.findall(text):
        if ty not in DBYTES:
            continue
        sz = 1
        for d in dims.split(","):
            if d:
                sz *= int(d)
        total += sz * DBYTES[ty]
    return total


def _group_size(line: str) -> int:
    """Replica-group size of a collective op line.

    Handles both HLO spellings: explicit ``replica_groups={{0,1},{2,3}}``
    and iota ``replica_groups=[num_groups,group_size]<=[...]``.
    """
    m = re.search(r"replica_groups=\[(\d+),(\d+)\]", line)
    if m:
        return int(m.group(2))
    m = re.search(r"replica_groups=\{\{([0-9,]*)\}", line)
    if m:
        return len([d for d in m.group(1).split(",") if d])
    return N_DEV


def parse_collectives(hlo: str):
    """Every collective op in the HLO as a dict with per-device traffic."""
    ops = []
    for line in hlo.splitlines():
        m = re.search(
            r"%\S+ = (\(?[\w\[\],{}0-9 ]*\)?) ("
            + "|".join(_KINDS) + r")\(", line)
        if not m:
            continue
        kind = m.group(2)
        result_b = _shape_bytes(m.group(1))
        meta = re.search(r'op_name="([^"]*)"', line)
        op_name = meta.group(1) if meta else ""
        conditional = "/cond/" in op_name
        if kind == "collective-permute":
            pairs = re.search(r"source_target_pairs=\{(.*?)\}\s*,", line)
            n_pairs = len(re.findall(r"\{\d+,\d+\}",
                                     pairs.group(1) if pairs else ""))
            per_dev = result_b * n_pairs / N_DEV
        else:
            g = _group_size(line)
            if kind == "all-reduce":
                per_dev = 2.0 * result_b * (g - 1) / g
            elif kind == "reduce-scatter":
                # operand = result * g
                per_dev = result_b * (g - 1)
            else:               # all-gather, all-to-all
                per_dev = result_b * (g - 1) / g
        ops.append(dict(kind=kind, result_bytes=result_b,
                        per_device=per_dev, conditional=conditional,
                        op_name=op_name, line=line.strip()))
    return ops


def account(hlo: str, n: int, label: str, verbose: bool = False) -> dict:
    ops = parse_collectives(hlo)
    full_p = len(re.findall(
        rf"all-gather[^\n]*f(?:64|32)\[{n},{n}\]", hlo))
    steady = sum(o["per_device"] for o in ops if not o["conditional"])
    rare = sum(o["per_device"] for o in ops if o["conditional"])
    result_total = sum(o["result_bytes"] for o in ops)
    by_kind = {}
    for o in ops:
        k = o["kind"] + ("(rare)" if o["conditional"] else "")
        c, b = by_kind.get(k, (0, 0.0))
        by_kind[k] = (c + 1, b + o["per_device"])
    print(f"[{label}] N={n}  full-P gathers={full_p}")
    print(f"    per-device traffic: steady-state {steady:,.0f} B/step"
          f"  + rare-path {rare:,.0f} B (cond frames only)")
    print(f"    (result-shape sum, the old round-3 metric: "
          f"{result_total:,} B)")
    for k, (c, b) in sorted(by_kind.items(), key=lambda kv: -kv[1][1]):
        print(f"      {k:<28} count={c:<5} per-device B={b:,.0f}")
    if verbose:
        for o in sorted(ops, key=lambda o: -o["per_device"])[:20]:
            print(f"    {o['per_device']:>12,.0f} B/dev  {o['kind']:<18} "
                  f"{o['op_name'][:90]}")
    return dict(label=label, n=n, full_p_gathers=full_p,
                per_device_steady=steady, per_device_rare=rare,
                result_shape_total=result_total,
                n_collectives=len(ops))


def make_cfg(max_features: int, dtype: str = "float64") -> SlamConfig:
    cam = CameraCalibration(
        pixels_x=640, pixels_y=480, cx=320.0, cy=240.0)
    return SlamConfig(camera=cam, max_features=max_features,
                      max_keypoints=256, dtype=dtype, pad_state_to=128)


def compile_hlo(cfg: SlamConfig, mesh_kind: str, execute: bool = False
                ) -> str:
    import time

    rt = SlamRuntime(cfg)
    img = jnp.zeros((cfg.camera.pixels_y, cfg.camera.pixels_x), jnp.uint8)
    if mesh_kind == "1d":
        mesh = make_mesh(jax.devices()[:N_DEV])
        state = shard_state(rt.make_initial_state(), mesh)
        fn = make_sharded_step(rt, mesh)
    else:
        mesh = make_mesh_2d(jax.devices()[:N_DEV], (2, 4))
        state = shard_state_2d(rt.make_initial_state(), mesh)
        fn = make_sharded_step_2d(rt, mesh)
    compiled = fn.lower(state, img).compile()
    if execute:
        # actually RUN the sharded step at this size on the virtual mesh
        # (collective shapes/replica groups are exact; only link speed
        # differs from real ICI): proves the pod-scale map program
        # executes, not merely compiles
        t0 = time.perf_counter()
        state2, rec = compiled(state, img)
        jax.block_until_ready(state2.x)
        wall = time.perf_counter() - t0
        assert bool(jnp.all(jnp.isfinite(state2.x)))
        assert bool(jnp.all(jnp.isfinite(state2.P)))
        print(f"    executed 1 sharded step: {wall:.1f} s wall "
              f"(2-core host; finiteness asserted)")
    return compiled.as_text()


def main():
    verbose = "-v" in sys.argv
    big = "--big" in sys.argv
    huge = "--huge" in sys.argv
    # (max_features, dtype, execute): f64 at the production sizes keeps
    # round-3/4 comparability; the pod-scale points run the f32
    # production dtype AND execute a real step on the virtual mesh
    sizes = [(96, "float64", False)]
    if big:
        sizes.append((275, "float64", False))
    if huge:
        sizes += [(1360, "float32", True), (2707, "float32", True)]
    rows = []
    for mf, dtype, execute in sizes:
        cfg = make_cfg(mf, dtype)
        n = cfg.padded_state_dim
        for mesh_kind in ("1d", "2d"):
            hlo = compile_hlo(cfg, mesh_kind, execute=execute)
            row = account(hlo, n, f"{mesh_kind} N={n} {dtype}",
                          verbose=verbose)
            row["dtype"] = dtype
            row["executed"] = execute
            rows.append(row)
    # 1-D vs 2-D per-device ratio at each size
    for i in range(0, len(rows), 2):
        r1, r2 = rows[i], rows[i + 1]
        ratio = (r2["per_device_steady"]
                 / max(r1["per_device_steady"], 1))
        print(f"N={r1['n']}: 2-D steady per-device traffic = "
              f"{ratio:.2f} x 1-D "
              f"({r2['per_device_steady']:,.0f} vs "
              f"{r1['per_device_steady']:,.0f} B/step)")
    out = "runs/sharding_diag/summary.json"
    if huge and not big:
        out = "runs/sharding_diag/summary_huge.json"
    os.makedirs("runs/sharding_diag", exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
