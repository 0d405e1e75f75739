"""Drive the ASAN-built C socket client against a live serving daemon.

Starts an in-process SlamServer on a Unix socket, writes a few real s3
frames as raw grayscale files, and runs the (sanitized) ekf_client_demo
binary against it -- the sockets/protocol surface of native/ekf_client.c
under AddressSanitizer.  Called by tools/run_asan.sh.
"""

import os
import subprocess
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.serving.server import SlamServer

FRAMES = "/root/reference/experiments/s3/costado_recto1"


def main():
    demo = sys.argv[1]
    cfg = SlamConfig(max_features=12, max_keypoints=64, max_hypotheses=12)

    srv = SlamServer.__new__(SlamServer)
    SlamServer.__init__(srv, config_path="")

    def create_with_cfg(payload):
        import struct

        from openekfmonoslam_tpu.engine.engine import SlamEngine
        engine = SlamEngine(cfg)
        with srv._lock:
            sid = srv._next_id
            srv._next_id += 1
            srv.sessions[sid] = engine
        return struct.pack("<I", sid)

    srv.create = create_with_cfg

    with tempfile.TemporaryDirectory() as d:
        sock = os.path.join(d, "ekf.sock")
        ready = threading.Event()
        t = threading.Thread(target=srv.serve, args=(sock, ready),
                             daemon=True)
        t.start()
        assert ready.wait(20), "server did not come up"

        from PIL import Image
        raws = []
        for i in range(1, 4):
            img = np.asarray(Image.open(
                os.path.join(FRAMES, f"{i:05d}.png")).convert("L"))
            p = os.path.join(d, f"{i:05d}.raw")
            img.tofile(p)
            raws.append(p)
        h, w = img.shape

        r = subprocess.run([demo, sock, str(h), str(w)] + raws,
                           capture_output=True, text=True, timeout=300)
        sys.stdout.write(r.stdout)
        sys.stderr.write(r.stderr)
        srv.shutdown()
        sys.exit(r.returncode)


if __name__ == "__main__":
    main()
