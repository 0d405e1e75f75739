"""Interactive-mode (frame-at-a-time) throughput, separated from compile.

The scan-mode bench (bench.py) measures the device-resident lax.scan --
but the reference's operating mode is frame-at-a-time
(samples/EKF/main.cpp:123-167), which is what `SlamEngine.step` users
and the serving daemon actually hit: one host->device frame upload, one
jitted step dispatch, and a small record fetch per frame.  This tool
measures that path's steady state (compile excluded), plus the same
loop through the serving daemon's socket, so BASELINE.md can carry an
interactive number next to the scan number (VERDICT r4 weak #7).

Run: python tools/interactive_bench.py
Writes runs/interactive/summary.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from openekfmonoslam_tpu.engine.engine import SlamEngine
from openekfmonoslam_tpu.io.sources import FileSequenceSource

CONFIG = "/root/reference/experiments/s3/config.yml"
SEQ = "/root/reference/experiments/s3/costado_recto1"


def bench_engine_loop(n_warm: int = 30, n_timed: int = 120) -> dict:
    frames = list(FileSequenceSource(SEQ, 1, n_warm + n_timed + 2))
    eng = SlamEngine(CONFIG)
    t_compile0 = time.perf_counter()
    eng.init(frames[0])
    eng.step(frames[1])
    compile_s = time.perf_counter() - t_compile0

    for f in frames[2:n_warm + 2]:
        eng.step(f)
    per_frame = []
    for f in frames[n_warm + 2:n_warm + 2 + n_timed]:
        t0 = time.perf_counter()
        eng.step(f)
        per_frame.append(time.perf_counter() - t0)
    per_frame = np.asarray(per_frame)
    return dict(
        mode="SlamEngine.step host loop",
        first_frame_incl_compile_s=compile_s,
        steady_ms_per_frame_median=float(np.median(per_frame) * 1e3),
        steady_ms_per_frame_p10=float(np.percentile(per_frame, 10) * 1e3),
        steady_fps_median=float(1.0 / np.median(per_frame)),
        n_timed=n_timed,
        backend=jax.default_backend(),
    )


def bench_daemon(n_warm: int = 20, n_timed: int = 60) -> dict:
    """The same loop through the serving daemon's localhost TCP socket
    (the Android-analog embedding path, serving/server.py)."""
    import socket
    import struct
    import threading

    from openekfmonoslam_tpu.serving import protocol as pr
    from openekfmonoslam_tpu.serving.server import SlamServer

    frames = list(FileSequenceSource(SEQ, 1, n_warm + n_timed + 2))
    server = SlamServer(CONFIG)
    ready = threading.Event()
    addr = "127.0.0.1:45557"
    th = threading.Thread(target=server.serve, args=(addr, ready),
                          daemon=True)
    th.start()
    ready.wait(10)
    sock = socket.create_connection(("127.0.0.1", 45557))

    def call(opcode, session, payload=b""):
        sock.sendall(pr.pack_request(opcode, session, payload))
        status, out = pr.read_response(sock)
        assert status == pr.ST_OK, out
        return out

    try:
        sid = struct.unpack("<I", call(pr.OP_CREATE, 0))[0]
        call(pr.OP_INIT, sid, frames[0].tobytes())
        for f in frames[1:n_warm + 1]:
            call(pr.OP_STEP, sid, f.tobytes())
        per_frame = []
        for f in frames[n_warm + 1:n_warm + 1 + n_timed]:
            t0 = time.perf_counter()
            call(pr.OP_STEP, sid, f.tobytes())
            per_frame.append(time.perf_counter() - t0)
        call(pr.OP_RELEASE, sid)
    finally:
        sock.close()
        server.shutdown()
    per_frame = np.asarray(per_frame)
    return dict(
        mode="serving daemon socket round-trip",
        steady_ms_per_frame_median=float(np.median(per_frame) * 1e3),
        steady_fps_median=float(1.0 / np.median(per_frame)),
        n_timed=n_timed,
    )


def main():
    rows = [bench_engine_loop()]
    print(f"[engine loop] {rows[0]['steady_ms_per_frame_median']:.2f} "
          f"ms/frame median ({rows[0]['steady_fps_median']:.0f} fps), "
          f"first frame incl compile "
          f"{rows[0]['first_frame_incl_compile_s']:.1f} s")
    try:
        rows.append(bench_daemon())
        print(f"[daemon]      "
              f"{rows[1]['steady_ms_per_frame_median']:.2f} ms/frame "
              f"median ({rows[1]['steady_fps_median']:.0f} fps)")
    except Exception as e:          # daemon path is optional here
        print(f"[daemon] skipped: {e}")
    os.makedirs("runs/interactive", exist_ok=True)
    with open("runs/interactive/summary.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote runs/interactive/summary.json")


if __name__ == "__main__":
    main()
