"""Per-phase timing of the frame step on the real device.

Times each pipeline phase as its own jitted function on realistic state
(after 30 real s3 frames), at both default and highest matmul precision.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import auto_max_features, load_config
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.filter import mapman
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter import predict as pred_mod
from openekfmonoslam_tpu.filter import ransac as ransac_mod
from openekfmonoslam_tpu.filter import update as upd_mod
from openekfmonoslam_tpu.filter import features as feat_mod
from openekfmonoslam_tpu.io.sources import FileSequenceSource
from openekfmonoslam_tpu.vision import brief, detect, fast, matching


def bench(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {name:34s} {dt*1e3:7.2f} ms")
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

    pred = jax.jit(meas_mod.predict_measurements)(state, rt.camera)
    ekf = cfg.ekf

    for prec in ["default", "highest"]:
        print(f"--- matmul precision: {prec} ---")
        with jax.default_matmul_precision(prec):
            total = 0.0
            total += bench("predict (F P F^T + strips)",
                           jax.jit(lambda s: pred_mod.predict(s, cfg)), state)
            total += bench("predict_measurements (h+H+S)",
                           jax.jit(lambda s: meas_mod.predict_measurements(
                               s, rt.camera)), state)
            total += bench("fast_scores+nms",
                           jax.jit(lambda g: fast.non_max_suppress(
                               fast.fast_scores(g, 20.0), 2)), gray)
            total += bench("blur (brief smooth)",
                           jax.jit(lambda g: brief.smooth(g, 2.0)), gray)
            mask_fn = jax.jit(lambda p: matching.ellipse_union_mask(
                (480, 640), p.uv, p.S, p.visible, rt.gate))
            total += bench("ellipse_union_mask", mask_fn, pred)
            score = jax.jit(lambda g: fast.non_max_suppress(
                fast.fast_scores(g, 20.0), 2))(gray)
            mask = mask_fn(pred)
            topk_fn = jax.jit(lambda s, m: fast.detect_keypoints(
                s, m, cfg.max_keypoints))
            total += bench("top-K detect", topk_fn, score, mask)
            kps = topk_fn(score, mask)
            sm = jax.jit(lambda g: brief.smooth(g, 2.0))(gray)
            ext_fn = jax.jit(lambda s, yx: brief.extract_shared(
                s, yx, rt.frontend._points_np, rt.frontend._pairs_np))
            total += bench("brief extract", ext_fn, sm, kps.yx)
            kp_desc = ext_fn(sm, kps.yx)
            kp_xy = jnp.stack([kps.yx[:, 1], kps.yx[:, 0]], -1).astype(
                jnp.float32)
            match_fn = jax.jit(lambda p, d: matching.match_predictions(
                p.uv, p.S, p.visible, state.descriptors, kp_xy, kps.valid,
                d, rt.gate, 1.0))
            total += bench("match_predictions", match_fn, pred, kp_desc)
            m = match_fn(pred, kp_desc)
            ransac_fn = jax.jit(lambda s, p, z, mm: ransac_mod.ransac(
                s, p, z, mm, rt.camera, 1.0, 0.99, 1.0, cfg.max_hypotheses))
            total += bench("ransac (batched+scan)", ransac_fn, state, pred,
                           m.z, m.matched)
            res = ransac_fn(state, pred, m.z, m.matched)
            upd_fn = jax.jit(lambda s, p, z, u: upd_mod.update(
                s, p, z, u, 1.0))
            total += bench("joint update", upd_fn, state, pred, m.z,
                           res.inliers)
            zone_fn = jax.jit(lambda xy, sc, av, p: detect.select_zone_balanced(
                xy, sc, av, p.uv.astype(jnp.float32), p.visible,
                jnp.int32(20), jnp.float32(rt.exclusion_radius),
                rt.zones_in_a_row, 640, 480, cfg.max_features))
            total += bench("zone-balance scan", zone_fn, kp_xy, kps.score,
                           kps.valid, pred)
            picked = zone_fn(kp_xy, kps.score, kps.valid, pred)
            add_fn = jax.jit(lambda s, uv, d, v: feat_mod.add_features(
                s, rt.camera, cfg, uv, d, v))
            total += bench("add_features (batched)", add_fn, state,
                           picked.uv.astype(jnp.float32), kp_desc[:96],
                           picked.valid)
            total += bench("convert_one_to_xyz",
                           jax.jit(lambda s: mapman.convert_one_to_xyz(
                               s, 0.1)), state)
            print(f"  {'SUM of phases':34s} {total*1e3:7.2f} ms")
            full = bench("FULL fused step", step_fn, state, gray)
            print(f"  (fusion saves {(total-full)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
