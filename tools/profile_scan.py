"""Per-phase scan timing of the CONFIGURED pipeline (STAR+BRIEF for s3).

Scanning a phase amortizes per-kernel dispatch, but each standalone scan
still carries a fixed per-call harness cost (~0.35 ms on the tunneled
chip: output fetch + loop-invariant staging) that dominates the small
phases -- read the numbers as "floor + phase", and use
tools/ablate_scan.py (subtractive, in the full step) for honest
attribution.  Kept because the MARGINAL differences between rows are
still informative.
"""

import dataclasses
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.filter import features as feat_mod
from openekfmonoslam_tpu.filter import mapman
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter import predict as pred_mod
from openekfmonoslam_tpu.filter import ransac as ransac_mod
from openekfmonoslam_tpu.filter import update as upd_mod
from openekfmonoslam_tpu.io.sources import FileSequenceSource
from openekfmonoslam_tpu.vision import brief, detect, fast, matching

N_ITER = 64


def scan_time(name, fn, *args):
    """Time fn applied N_ITER times via scan (args are loop-invariant)."""

    @jax.jit
    def run():
        def body(i, _):
            out = fn(*args)
            # fold a scalar back so the loop isn't DCE'd
            leaf = jax.tree.leaves(out)[0]
            return i + 1, jnp.sum(leaf).astype(jnp.float32)

        _, outs = jax.lax.scan(body, jnp.int32(0), None, length=N_ITER)
        return outs

    out = run()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"  {name:40s} {dt*1e3:7.3f} ms")
    return dt


def main():
    cfg = load_config("/root/reference/experiments/s3/config.yml")
    cfg = dataclasses.replace(cfg, max_features=auto_max_features(cfg.ekf))
    rt = SlamRuntime(cfg)
    frames = np.stack(list(FileSequenceSource(
        "/root/reference/experiments/s3/costado_recto1", 1, 31)))
    init_fn, step_fn = rt.jitted()
    state = init_fn(rt.make_initial_state(), jnp.asarray(frames[0]))
    for t in range(1, 30):
        state, _ = step_fn(state, jnp.asarray(frames[t]))
    gray = jnp.asarray(frames[30])
    jax.block_until_ready(state.x)
    ekf = cfg.ekf

    with jax.default_matmul_precision("highest"):
        pred = jax.jit(meas_mod.predict_measurements)(state, rt.camera)
        total = 0.0
        total += scan_time("predict", lambda s: pred_mod.predict(s, cfg),
                           state)
        total += scan_time("predict_measurements",
                           lambda s: meas_mod.predict_measurements(
                               s, rt.camera), state)

    with jax.default_matmul_precision("default"):
        total += scan_time("frontend.precompute (configured: "
                           + rt.frontend.det_kind + "+"
                           + rt.frontend.desc_kind + ")",
                           rt.frontend.precompute, gray)
        mask_fn = lambda p: matching.ellipse_union_mask(  # noqa: E731
            (480, 640), p.uv, p.S, p.visible, rt.gate)
        total += scan_time("ellipse_union_mask", mask_fn, pred)
        aux = jax.jit(rt.frontend.precompute)(gray)
        score = aux["score_nms"]
        mask = jax.jit(mask_fn)(pred)
        total += scan_time("top-K detect x2",
                           lambda s, m: (fast.detect_keypoints(
                               s, m, cfg.max_keypoints),
                               fast.detect_keypoints(
                                   s, ~m, cfg.max_keypoints)), score, mask)
        kps = jax.jit(lambda s, m: fast.detect_keypoints(
            s, m, cfg.max_keypoints))(score, mask)
        total += scan_time("describe (configured)",
                           lambda a, yx: rt.frontend.describe(a, yx),
                           aux, kps.yx)
        kp_desc = jax.jit(rt.frontend.describe)(aux, kps.yx)
        kp_xy = jnp.stack([kps.yx[:, 1], kps.yx[:, 0]], -1).astype(
            jnp.float32)
        total += scan_time("match_predictions",
                           lambda p, d: matching.match_predictions(
                               p.uv, p.S, p.visible, state.descriptors,
                               kp_xy, kps.valid, d, rt.gate, 1.0),
                           pred, kp_desc)
        m = jax.jit(lambda p, d: matching.match_predictions(
            p.uv, p.S, p.visible, state.descriptors, kp_xy, kps.valid, d,
            rt.gate, 1.0))(pred, kp_desc)
        total += scan_time("zone_balance(whileloop, needed=0)",
                           lambda xy, sc, av, p: detect.select_zone_balanced(
                               xy, sc, av, p.uv.astype(jnp.float32),
                               p.visible, jnp.int32(0),
                               jnp.float32(rt.exclusion_radius),
                               rt.zones_in_a_row, 640, 480,
                               cfg.max_features),
                           kp_xy, kps.score, kps.valid, pred)

    with jax.default_matmul_precision("highest"):
        total += scan_time("ransac", lambda s, p, z, mm: ransac_mod.ransac(
            s, p, z, mm, rt.camera, 1.0, 0.99, 1.0, cfg.max_hypotheses),
            state, pred, m.z, m.matched)
        res = jax.jit(lambda s, p, z, mm: ransac_mod.ransac(
            s, p, z, mm, rt.camera, 1.0, 0.99, 1.0, cfg.max_hypotheses))(
                state, pred, m.z, m.matched)
        total += scan_time("joint update x2",
                           lambda s, p, z, u: upd_mod.update(
                               upd_mod.update(s, p, z, u, 1.0), p, z, u,
                               1.0), state, pred, m.z, res.inliers)
        total += scan_time("counters+remove+convert",
                           lambda s: mapman.convert_one_to_xyz(
                               mapman.remove_features(
                                   mapman.update_counters(
                                       s, pred.visible, res.inliers, m.desc),
                                   mapman.bad_feature_mask(s, 0.5)), 0.1),
                           state)
        total += scan_time("add_features(batched, 8 cands)",
                           lambda s: feat_mod.add_features(
                               s, rt.camera, cfg, m.z[:8],
                               state.descriptors[:8],
                               jnp.zeros((8,), bool)), state)

    print(f"  {'SUM':40s} {total*1e3:7.3f} ms")

    # reference: the full fused step, scanned
    @jax.jit
    def full_scan(s, g):
        def body(st, _):
            st, rec = rt.step(st, g)
            return st, rec.total_matches

        return jax.lax.scan(body, s, None, length=N_ITER)

    out = full_scan(state, gray)
    jax.block_until_ready(out[0].x)
    t0 = time.perf_counter()
    out = full_scan(state, gray)
    jax.block_until_ready(out[0].x)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"  {'FULL STEP (scanned)':40s} {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
