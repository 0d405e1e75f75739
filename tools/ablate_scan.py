"""Phase cost attribution by ablation, measured in-scan on the device.

Separately-jitted phase timings are useless on a tunneled device (launch
bound, tools/profile_step.py) and per-phase scan loops hit a fixed
per-iteration floor (tools/profile_scan.py).  The honest attribution is
subtractive: scan the *full* step and variants of it with one phase
stubbed out, in the exact shape bench.py runs, and read each phase's cost
off the delta.  Fusion makes deltas slightly non-additive; they still
rank the walls correctly.

Run: python tools/ablate_scan.py  (real device; ~1 compile per variant,
persistent-cached).
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter import predict as pred_mod
from openekfmonoslam_tpu.filter import update as upd_mod
from openekfmonoslam_tpu.filter import ransac as ransac_mod
from openekfmonoslam_tpu.io.sources import FileSequenceSource

N_ITER = 192


def make_variant(rt: SlamRuntime, skip: set):
    """A step-like body with the named phases stubbed out."""

    def body(state, gray):
        with jax.default_matmul_precision("highest"):
            if "measure" in skip:
                pred = None
            elif "predict" in skip:
                pred = meas_mod.predict_measurements(state, rt.camera)
            else:
                state, pred = rt.phase_predict(state)

            if "match" in skip:
                # keep the frontend precompute (mapman needs its planes);
                # this variant removes only mask+detect+gated matching
                F = rt.config.max_features
                m_z = jnp.zeros((F, 2), rt.dtype)
                m_matched = jnp.zeros((F,), bool)
                m_desc = state.descriptors

                class M:
                    z = m_z
                    matched = m_matched
                    desc = m_desc
                    refreshed = m_matched
                m = M()
                aux = (rt.frontend.precompute(gray)
                       if "mapman" not in skip or "precompute" not in skip
                       else None)
                in_ellipse = jnp.ones(gray.shape, bool)
            else:
                m, aux, in_ellipse = rt.phase_match(state, pred, gray)

            if "ransac" in skip:
                inliers = m.matched
                outliers = m.matched & False
            else:
                res = rt.phase_ransac(state, pred, m)
                inliers, outliers = res.inliers, res.outliers

            if "update_li" not in skip:
                state = rt.phase_update_li(state, pred, m, inliers)

            if "rescue" in skip:
                rescued = outliers & False
            else:
                pred2, rescued = rt.phase_rescue(state, m, outliers)
                if "update_hi" not in skip:
                    state = rt.phase_update_hi(state, pred2, m, rescued)

            if "mapman" not in skip:
                state, *_ = rt.phase_mapman(
                    state, pred, m, inliers | rescued, aux, in_ellipse)

            return state, jnp.sum(m.matched.astype(jnp.int32))

    return body


def time_variant(name, rt, body, state0, frames):
    @jax.jit
    def run(st, fr):
        def f(s, frame):
            return body(s, frame)
        return jax.lax.scan(f, st, fr)

    out = run(state0, frames)
    jax.block_until_ready(out[0].x)
    t0 = time.perf_counter()
    out = run(state0, frames)
    jax.block_until_ready(out[0].x)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"  {name:28s} {dt*1e3:7.3f} ms/frame", flush=True)
    return dt


def main():
    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    raw = np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, 33)))
    init_fn, step_fn = rt.jitted()
    state = init_fn(rt.make_initial_state(), jnp.asarray(raw[0]))
    for t in range(1, 30):
        state, _ = step_fn(state, jnp.asarray(raw[t]))
    jax.block_until_ready(state.x)

    # N_ITER frames by cycling the real tail (content barely matters for
    # timing; state stays in a realistic regime)
    frames = jnp.asarray(
        np.concatenate([raw[30:32]] * (N_ITER // 2))[:N_ITER])

    variants = [
        ("FULL", set()),
        ("- predict", {"predict"}),
        ("- match(vision)", {"match"}),
        ("- ransac", {"ransac"}),
        ("- update_li", {"update_li"}),
        ("- rescue+update_hi", {"rescue"}),
        ("- update_hi", {"update_hi"}),
        ("- mapman", {"mapman"}),
        ("predict+precompute", {"match", "ransac", "update_li", "rescue",
                                "mapman"}),
        ("predict only", {"match", "ransac", "update_li", "rescue",
                          "mapman", "precompute"}),
        ("measurements only", {"predict", "match", "ransac", "update_li",
                               "rescue", "mapman", "precompute"}),
        ("carry-through", {"measure", "predict", "match", "ransac",
                           "update_li", "rescue", "mapman", "precompute"}),
    ]
    results = {}
    for name, skip in variants:
        results[name] = time_variant(name, rt, make_variant(rt, skip),
                                     state, frames)

    full = results["FULL"]
    print("\n  deltas vs FULL (cost attributed to the removed phase):")
    for name, dt in results.items():
        if name != "FULL":
            print(f"  {name:28s} {(full-dt)*1e3:+7.3f} ms")


if __name__ == "__main__":
    main()
