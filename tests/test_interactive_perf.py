"""Interactive-mode (frame-at-a-time) path: record correctness + cost.

BASELINE.md's interactive row was measured on the TPU
(tools/interactive_bench.py); this CPU test locks the two properties
that made that number: (1) the per-frame record comes from ONE packed
device fetch (fetch count is what bounds a remote/tunneled device), and
(2) the host loop costs within a small factor of the device-resident
scan per frame -- i.e. nobody reintroduces per-field fetches or
host-side recompute into SlamEngine.step.
"""

import time

import jax
import numpy as np

from openekfmonoslam_tpu.engine.engine import SlamEngine
from openekfmonoslam_tpu.engine.scan_runner import scan_frames

CONFIG = "/root/reference/experiments/s3/config.yml"
SEQ = "/root/reference/experiments/s3/costado_recto1"


def test_interactive_step_within_factor_of_scan():
    from functools import partial

    import jax.numpy as jnp

    from openekfmonoslam_tpu.io.sources import FileSequenceSource

    frames = list(FileSequenceSource(SEQ, 1, 16))
    eng = SlamEngine(CONFIG, max_features=48, dtype="float32")
    eng.init(frames[0])
    eng.step(frames[1])                      # compile
    for f in frames[2:6]:
        eng.step(f)
    t0 = time.perf_counter()
    recs = [eng.step(f) for f in frames[6:14]]
    interactive_ms = (time.perf_counter() - t0) / 8 * 1e3

    # record sanity from the packed summary vector
    r = recs[-1]
    assert np.isfinite(r["position"]).all()
    assert len(r["covariance_cam"]) == 13
    assert r["total_matches"] >= 0 and r["n_active"] > 0
    assert r["n_xyz"] + r["n_inverse_depth"] == r["n_active"]

    rt = eng.runtime
    scan_fn = jax.jit(partial(scan_frames, rt))
    stack = jnp.asarray(np.stack(frames[6:14]))
    state = eng.state
    s1, _ = scan_fn(state, stack)            # compile
    jax.block_until_ready(s1.x)
    t0 = time.perf_counter()
    s1, _ = scan_fn(state, stack)
    jax.block_until_ready(s1.x)
    scan_ms = (time.perf_counter() - t0) / 8 * 1e3

    # on CPU the host loop's overhead is the one packed fetch + dispatch:
    # a generous 3x bound catches any reintroduced per-field fetch storm
    # or host-side recompute (the bug this guards against measured ~8x
    # on the tunneled TPU before the packed-summary fix)
    assert interactive_ms < 3.0 * scan_ms + 50.0, (
        f"interactive {interactive_ms:.1f} ms/frame vs scan "
        f"{scan_ms:.1f} -- the frame-at-a-time path regressed")
