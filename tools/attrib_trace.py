"""Per-source-line device-time attribution: xplane trace x compiled HLO.

The round-4 perf workflow: capture an xprof trace of the scan
(tools/trace.py), dump the compiled scan HLO, join trace op names
against the HLO's source_file/source_line metadata, and print us/frame
per source file and per source line.  This table drove the shared-HP
refactor, the Pallas S-inverse and measurement-chain kernels, the
feature-add cond fix, and the STAR precision change.

Run (after `python tools/trace.py runs/trace_r4 32`):
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/attrib_trace.py [trace_dir] [n_frames]
(pure-python protobuf needed: the compiled _pywrap parser in this image
lacks xspace support).
"""

import dataclasses
import glob
import re
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def dump_scan_hlo() -> str:
    from openekfmonoslam_tpu.config import auto_max_features, load_config
    from openekfmonoslam_tpu.engine.scan_runner import scan_frames
    from openekfmonoslam_tpu.engine.step import SlamRuntime

    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    frames = jnp.zeros((8, 480, 640), jnp.uint8)
    state = rt.make_initial_state()
    return jax.jit(partial(scan_frames, rt)).lower(
        state, frames).compile().as_text()


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/trace_r4"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    src = {}
    for line in dump_scan_hlo().splitlines():
        m = re.match(r"\s*%([\w.\-]+) = ", line)
        if not m:
            continue
        f = re.search(r'source_file="([^"]*)" source_line=(\d+)', line)
        if f:
            src[m.group(1)] = (
                f.group(1).replace("/root/repo/openekfmonoslam_tpu/", ""),
                int(f.group(2)))

    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    plane = [p for p in xs.planes if p.name == "/device:TPU:0"][0]
    md = plane.event_metadata

    by_file = defaultdict(float)
    by_line = defaultdict(float)
    unattr = 0.0
    for line in plane.lines:
        for ev in line.events:
            name = md[ev.metadata_id].name
            if "copy-start" in name or "copy-done" in name:
                continue
            head = name.split(" = ")[0].lstrip("%")
            if head.startswith(("while", "jit_", "cond")):
                continue
            us = ev.duration_ps / 1e6 / n_frames
            if head in src:
                f, ln = src[head]
                by_file[f] += us
                by_line[(f, ln)] += us
            else:
                unattr += us
    print("us/frame by source file:")
    for f, us in sorted(by_file.items(), key=lambda kv: -kv[1]):
        if us > 2:
            print(f"  {us:7.1f}  {f}")
    print(f"  {unattr:7.1f}  (unattributed: op names not in this HLO dump)")
    print("\ntop source lines:")
    for (f, ln), us in sorted(by_line.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us:7.1f}  {f}:{ln}")


if __name__ == "__main__":
    main()
