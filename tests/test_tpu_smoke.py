"""Real-device smoke test: the engine step must run on the TPU itself.

Every other test forces JAX_PLATFORMS=cpu (tests/conftest.py), so a
TPU-only numeric regression (e.g. a bf16 matmul sneaking past
default_matmul_precision) would pass CI.  This test launches a child
process WITHOUT the CPU override, runs 6 real s3 frames on whatever
accelerator the environment provides, and checks the result against the
same frames run on CPU float32 in another child.

Skips (not fails) when the environment has no accelerator: the child
reports platform "cpu" and the comparison degenerates.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

CHILD = os.path.join(os.path.dirname(__file__), "tpu_smoke_child.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 6


def _run_child(platform):
    """Run the child pinned to ``platform`` (None = environment default,
    i.e. the tunneled TPU under the harness).  The platform is passed as
    argv and pinned in-process (a JAX_PLATFORMS env var can be overridden
    by the harness sitecustomize).  The tunneled TPU client intermittently
    hangs at startup, so device children get a deadline and one retry
    instead of a single long timeout."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    argv = [sys.executable, CHILD, str(N_FRAMES), platform or ""]
    attempts, timeout = (2, 420) if platform is None else (1, 900)
    err = None
    for _ in range(attempts):
        try:
            out = subprocess.run(argv, env=env, cwd=REPO,
                                 capture_output=True, text=True,
                                 timeout=timeout)
        except subprocess.TimeoutExpired:
            err = f"child timed out after {timeout}s (tunnel hang?)"
            continue
        if out.returncode != 0:
            return None, out.stderr[-2000:]
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line), None
    return None, err


@pytest.mark.tpu
def test_device_step_matches_cpu():
    dev, err = _run_child(None)          # environment default (TPU/axon)
    if dev is None:
        pytest.skip(f"no device backend reachable: {err}")
    if dev["platform"] == "cpu":
        pytest.skip("environment default platform is cpu (no accelerator)")

    assert dev["finite"], "device run produced non-finite state"
    matches = np.asarray(dev["matches"])
    assert (matches[1:] >= 20).all(), f"device run lost tracking: {matches}"

    cpu, err = _run_child("cpu")
    assert cpu is not None, f"cpu child failed: {err}"

    # Same engine, same frames, f32 on both backends: trajectories may
    # diverge slowly through reordered reductions, but over 5 steps the
    # camera position (meters, travel ~5 mm here) must agree closely and
    # match counts must be in the same regime.
    x_dev = np.asarray(dev["x_cam"])
    x_cpu = np.asarray(cpu["x_cam"])
    np.testing.assert_allclose(x_dev[:, :3], x_cpu[:, :3], atol=2e-3)
    m_cpu = np.asarray(cpu["matches"])
    assert np.abs(matches - m_cpu).max() <= max(5, int(0.3 * m_cpu.max()))
