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


def phase_share_calibration(runtime: SlamRuntime,
                            frames: np.ndarray) -> np.ndarray:
    """Measure the 7 reference phases' relative time shares (EKF.cpp's
    Prediction/Matching/Ransac/UpdateLI/RescueOutliers/UpdateHI/
    MapManagement taxonomy) by bracketing separately-jitted phase calls
    over a few frames.  Used to attribute scan-mode per-frame budgets,
    where the fused program cannot be bracketed from the host."""
    import time

    fns = [jax.jit(runtime.phase_predict), jax.jit(runtime.phase_match),
           jax.jit(runtime.phase_ransac), jax.jit(runtime.phase_update_li),
           jax.jit(runtime.phase_rescue), jax.jit(runtime.phase_update_hi),
           jax.jit(runtime.phase_mapman)]
    state = runtime.make_initial_state()
    state = jax.jit(runtime.init_step)(state, jnp.asarray(frames[0]))
    totals = np.zeros(7)

    def run_frame(st, frame, acc):
        outs = []
        t = [0.0] * 7

        def bracket(i, fn, *a):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            t[i] = time.perf_counter() - t0
            return out

        st, pred = bracket(0, fns[0], st)
        m, aux, in_ellipse = bracket(1, fns[1], st, pred, frame)
        res = bracket(2, fns[2], st, pred, m)
        st = bracket(3, fns[3], st, pred, m, res.inliers)
        pred2, rescued = bracket(4, fns[4], st, m, res.outliers)
        st = bracket(5, fns[5], st, pred2, m, rescued)
        st, *_ = bracket(6, fns[6], st, pred, m, res.inliers | rescued,
                         aux, in_ellipse)
        if acc is not None:
            acc += np.asarray(t)
        return st

    state = run_frame(state, jnp.asarray(frames[1]), None)   # compile
    for f in frames[2:]:
        state = run_frame(state, jnp.asarray(f), totals)
    s = totals.sum()
    return totals / s if s > 0 else np.full(7, 1.0 / 7)


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
