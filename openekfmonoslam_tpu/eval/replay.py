"""Record a live run's injection log and replay it through the filter.

The log captures everything the vision front-end feeds the filter -- the
bootstrap detections, per-frame per-slot measurements, and the new-feature
additions (pixel + slot id) -- so the identical measurement stream can be
replayed through SlamRuntime.step_injected (the TPU engine minus vision)
and through eval.oracle.ReferenceOracle (the bug-compatible float64
reimplementation of the reference filter).  This is the measured-parity
harness SURVEY.md section 4 calls for: the HandMatching idea
(HandMatching.cpp:37-99) extended with feature-lifecycle events.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.engine.scan_runner import scan_frames_masked
from openekfmonoslam_tpu.engine.step import SlamRuntime


def record_live_log(runtime: SlamRuntime, frames: np.ndarray,
                    chunk: int = 32) -> dict:
    """Run the live engine over ``frames`` (T, H, W) and return
    {"init": [(uv, slot), ...], "frames": [{z, matched, new}, ...],
    "trajectory": (T-1, 13)}."""
    from functools import partial

    init_fn = jax.jit(runtime.init_step_recorded)
    scan_fn = jax.jit(partial(scan_frames_masked, runtime))

    state = runtime.make_initial_state()
    state, uv0, ok0, slot0 = init_fn(state, jnp.asarray(frames[0]))
    uv0, ok0, slot0 = (np.asarray(uv0), np.asarray(ok0), np.asarray(slot0))
    log = {"init": [(uv0[i], int(slot0[i])) for i in range(len(ok0))
                    if ok0[i]],
           "frames": [], "trajectory": None}

    rest = frames[1:]
    rec_parts = []
    for i in range(0, len(rest), chunk):
        part = rest[i:i + chunk]
        real = np.ones((chunk,), bool)
        n_real = len(part)
        if n_real < chunk:
            real[n_real:] = False
            part = np.concatenate(
                [part, np.repeat(part[-1:], chunk - n_real, axis=0)])
        state, recs = scan_fn(state, jnp.asarray(part), jnp.asarray(real))
        rec_parts.append(jax.tree.map(
            lambda a: np.asarray(a)[:n_real], recs))
    recs = jax.tree.map(lambda *xs: np.concatenate(xs), *rec_parts)

    T = recs.z.shape[0]
    for t in range(T):
        new = [(recs.new_uv[t][c], int(recs.new_slot[t][c]))
               for c in range(recs.new_ok.shape[1]) if recs.new_ok[t][c]]
        log["frames"].append({
            "z": recs.z[t].astype(np.float64),
            "matched": recs.matched[t].copy(),
            "new": new,
        })
    log["trajectory"] = recs.x_cam.astype(np.float64)
    log["records"] = recs
    return log


def replay_through_engine(runtime: SlamRuntime, log: dict) -> np.ndarray:
    """Replay the log through step_injected; returns the (T, 13) camera
    trajectory."""
    cfg = runtime.config
    state = runtime.make_initial_state()

    C = cfg.max_features
    uv = np.zeros((C, 2))
    valid = np.zeros((C,), bool)
    slots0 = np.full((C,), C, np.int32)
    n0 = min(len(log["init"]), C)
    for i, (p, slot) in enumerate(log["init"][:n0]):
        uv[i] = p
        valid[i] = True
        slots0[i] = slot
    from openekfmonoslam_tpu.filter import features as feat_mod
    desc = jnp.zeros((C,) + state.descriptors.shape[1:],
                     state.descriptors.dtype)
    state = feat_mod.add_features_at(
        state, runtime.camera, cfg, jnp.asarray(uv, state.x.dtype), desc,
        jnp.asarray(slots0), jnp.asarray(valid))

    step = jax.jit(runtime.step_injected)
    traj = []
    for fr in log["frames"]:
        uv = np.zeros((C, 2))
        valid = np.zeros((C,), bool)
        slots = np.full((C,), C, np.int32)
        for i, (p, slot) in enumerate(fr["new"][:C]):
            uv[i] = p
            valid[i] = True
            slots[i] = slot
        # adds are replayed INTO the recorder's slot ids so the log's
        # slot-keyed measurements keep addressing the same landmarks even
        # if this run's mapman decisions diverge from the recorder's
        state, rec = step(state, jnp.asarray(fr["z"], state.x.dtype),
                          jnp.asarray(fr["matched"]),
                          new_uv=jnp.asarray(uv, state.x.dtype),
                          new_desc=None,
                          new_valid=jnp.asarray(valid),
                          new_slot=jnp.asarray(slots))
        traj.append(np.asarray(rec.x_cam, np.float64))
    return np.stack(traj)
