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


def scan_frames_masked(runtime: SlamRuntime, state: SlamState,
                       frames: jnp.ndarray, real: jnp.ndarray
                       ) -> tuple[SlamState, StepRecord]:
    """scan_frames with a per-frame ``real`` (T,) bool: padded frames
    (real=False) run the step but discard its carry, so the final state is
    exactly the state after the last real frame.  Keeps one compiled shape
    for padded tail chunks."""

    def body(st, inp):
        frame, is_real = inp
        st2, rec = runtime.step(st, frame)
        st_out = jax.tree.map(
            lambda a, b: jnp.where(is_real, a, b), st2, st)
        return st_out, rec

    return jax.lax.scan(body, state, (frames, real))


def run_sequence_on_device(runtime: SlamRuntime, frames: np.ndarray,
                           chunk: int = 0):
    """init on frame 0, scan the rest.  ``chunk`` > 0 scans in chunks of
    that many frames (bounds device memory for long sequences and lets the
    host stream uploads); 0 = single scan.

    Returns (final_state, records_dict_of_stacked_numpy).
    """
    init_fn = jax.jit(runtime.init_step)
    scan_fn = jax.jit(partial(scan_frames_masked, runtime))

    state = runtime.make_initial_state()
    state = init_fn(state, jnp.asarray(frames[0]))

    rest = frames[1:]
    if chunk <= 0:
        chunk = len(rest)
    rec_parts = []
    for i in range(0, len(rest), chunk):
        part = rest[i:i + chunk]
        real = np.ones((chunk,), dtype=bool)
        if len(part) < chunk:
            # pad to the compiled chunk length; padded steps discard their
            # carry (real=False) so the final state is exact, and their
            # records are dropped below
            real[len(part):] = False
            pad = np.repeat(part[-1:], chunk - len(part), axis=0)
            n_real = len(part)
            part = np.concatenate([part, pad])
        else:
            n_real = chunk
        state, recs = scan_fn(state, jnp.asarray(part), jnp.asarray(real))
        recs = jax.tree.map(lambda a: np.asarray(a)[:n_real], recs)
        rec_parts.append(recs)

    records = jax.tree.map(lambda *xs: np.concatenate(xs), *rec_parts)
    return state, records
