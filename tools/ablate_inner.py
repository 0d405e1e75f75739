"""Second-level ablation: costs *inside* the match/update/ransac phases.

tools/ablate_scan.py attributes the frame time to the seven reference
phases; this tool opens up the expensive ones.  Same method: scan the
full step with ONE internal piece substituted by a free stand-in, read
the cost off the delta.
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
from openekfmonoslam_tpu.filter import features as feat_mod
from openekfmonoslam_tpu.filter import mapman
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter import ransac as ransac_mod
from openekfmonoslam_tpu.filter import update as upd_mod
from openekfmonoslam_tpu.filter.measure import Prediction
from openekfmonoslam_tpu.io.sources import FileSequenceSource
from openekfmonoslam_tpu.vision import detect, fast, matching
from jax.scipy.linalg import cho_factor, cho_solve

N_ITER = 192


def make_body(rt: SlamRuntime, mods: set):
    cfg = rt.config
    ekf = cfg.ekf

    def kalman_update_mod(state, pred, z, use, pixel_error):
        P = state.P
        dtype = P.dtype
        res, H = upd_mod.masked_innovation(pred, z, use, P.shape[0])
        use2 = jnp.repeat(use, 2)
        HP = H @ P
        if "upd_no_solve" in mods:
            KT = HP * 1e-3
        else:
            S = HP @ H.T
            r_diag = jnp.where(use2, jnp.asarray(pixel_error, dtype), 1.0)
            m2 = use2.astype(dtype)
            S = S * m2[:, None] * m2[None, :] + jnp.diag(r_diag)
            KT = cho_solve(cho_factor(S, lower=True), HP)
        x = state.x + KT.T @ res
        if "upd_no_downdate" not in mods:
            P = P - KT.T @ HP
        st = state._replace(x=x, P=P)
        if "upd_no_finalize" in mods:
            return st
        return upd_mod.finalize_update(st, jnp.any(use))

    def update_mod(state, pred, z, use, pixel_error):
        return kalman_update_mod(state, pred, z, use, pixel_error)

    def phase_match_mod(state, pred, gray):
        if "pre_all_fake" in mods:
            g32 = gray.astype(jnp.float32)
            aux = {"score_raw": g32, "score_nms": g32,
                   "planes": jnp.zeros((8,) + gray.shape, jnp.uint32)}
        elif "pre_fake_planes" in mods:
            aux = rt.frontend.precompute(gray)
            aux = dict(aux)
            aux["planes"] = jnp.zeros((8,) + gray.shape, jnp.uint32)
        elif "pre_fake_score" in mods:
            aux = rt.frontend.precompute(gray)
            aux = dict(aux)
            g32 = gray.astype(jnp.float32)
            aux["score_raw"], aux["score_nms"] = g32, g32
        else:
            aux = rt.frontend.precompute(gray)
        if "match_no_mask" in mods:
            in_ellipse = rt._border_mask(gray.shape)
        elif "match_exact_mask" in mods:
            in_ellipse = matching.ellipse_union_mask(
                gray.shape, pred.uv, pred.S, pred.visible, rt.gate, block=1)
        else:
            in_ellipse = matching.ellipse_union_mask(
                gray.shape, pred.uv, pred.S, pred.visible, rt.gate)
        if "match_no_detect" in mods:
            # stand-in keypoints AT the predicted positions so downstream
            # match statistics stay in the FULL run's regime (otherwise
            # needed>0 inflates the data-dependent zone-balance loop)
            K = cfg.max_keypoints
            h, w = gray.shape
            yx = jnp.zeros((K, 2), jnp.int32)
            py = jnp.clip(jnp.round(pred.uv[:, 1]).astype(jnp.int32), 4,
                          h - 5)
            px = jnp.clip(jnp.round(pred.uv[:, 0]).astype(jnp.int32), 4,
                          w - 5)
            yx = yx.at[:pred.uv.shape[0], 0].set(py)
            yx = yx.at[:pred.uv.shape[0], 1].set(px)
            valid = jnp.zeros((K,), bool).at[:pred.uv.shape[0]].set(
                pred.visible)
            kps = fast.Keypoints(yx=yx, score=jnp.ones((K,), jnp.float32),
                                 valid=valid)
        else:
            kps = fast.detect_keypoints(
                aux["score_nms"],
                in_ellipse & rt._border_mask(gray.shape),
                cfg.max_keypoints)
        kp_xy = jnp.stack([kps.yx[:, 1], kps.yx[:, 0]], -1).astype(rt.dtype)
        if "match_no_describe" in mods:
            kp_desc = jnp.zeros(
                (cfg.max_keypoints,) + state.descriptors.shape[1:],
                state.descriptors.dtype)
        else:
            kp_desc = rt.frontend.describe(aux, kps.yx)
        if "match_no_2nn" in mods:
            # matches at the predictions: keeps needed<0 downstream
            m = matching.Matches(
                z=pred.uv + 0.25,
                matched=pred.visible,
                desc=state.descriptors,
                distance=jnp.zeros((pred.uv.shape[0],), jnp.int32))
        else:
            m = matching.match_predictions(
                pred.uv, pred.S, pred.visible, state.descriptors,
                kp_xy, kps.valid, kp_desc, rt.gate,
                ekf.matching_comp_coef_second_best_vs_first,
                distance_fn=rt.frontend.distance)
        if cfg.subpixel_matches and "match_no_subpixel" not in mods:
            z_sub = fast.subpixel_refine(
                aux["score_raw"].astype(rt.dtype), m.z, m.matched)
            m = m._replace(z=z_sub)
        return m, aux, in_ellipse

    def phase_ransac_mod(state, pred, m):
        if "ransac_stub" in mods:
            return ransac_mod.RansacResult(
                inliers=m.matched, outliers=m.matched & False,
                best_support=jnp.int32(0), hypotheses_visited=jnp.int32(0))
        if "ransac_no_support" in mods:
            states_x = ransac_mod._batched_state_only_updates(
                state, pred, m.z, m.matched, cfg.camera.pixel_error_x)
            support = jnp.sum(states_x, axis=-1)  # fake, keeps dep
            good = m.matched[None, :] & (support[:, None] > -1e30)
            best_i = jnp.argmax(jnp.where(m.matched, support, -jnp.inf))
            inliers = good[best_i] & m.matched
            return ransac_mod.RansacResult(
                inliers=inliers, outliers=m.matched & ~inliers,
                best_support=jnp.int32(0), hypotheses_visited=jnp.int32(0))
        return rt.phase_ransac(state, pred, m)

    def phase_mapman_mod(state, pred, m, inliers_all, aux, in_ellipse):
        h, w = aux["score_nms"].shape
        state = mapman.update_counters(state, pred.visible, inliers_all,
                                       m.desc)
        do_mm = jnp.logical_and(
            ekf.map_management_frequency > 0,
            state.frame % max(ekf.map_management_frequency, 1) == 0)
        needed = jnp.int32(ekf.min_matches_per_image) - jnp.sum(
            inliers_all.astype(jnp.int32))
        bad = mapman.bad_feature_mask(state, ekf.good_feature_matching_percent)
        state = mapman.remove_features(state, bad & do_mm)
        pressure = mapman.map_pressure(
            state, needed, ekf.always_remove_unseen_map_features,
            ekf.max_map_features_count, ekf.max_map_size)
        unseen = state.active & ~pred.visible
        state = mapman.remove_features(state, unseen & pressure & do_mm)
        if "mm_no_convert" not in mods:
            state = jax.lax.cond(
                do_mm,
                lambda s: mapman.convert_one_to_xyz(
                    s, ekf.inverse_depth_linearity_index_threshold),
                lambda s: s, state)
        out_mask = ~in_ellipse & rt._border_mask((h, w))
        kps2 = fast.detect_keypoints(aux["score_nms"], out_mask,
                                     cfg.max_keypoints)
        kp2_xy = jnp.stack([kps2.yx[:, 1], kps2.yx[:, 0]],
                           -1).astype(jnp.float32)
        if "mm_no_zone" in mods:
            picked = detect.NewFeatures(
                uv=kp2_xy[:cfg.max_features],
                valid=jnp.zeros((cfg.max_features,), bool),
                kp_index=jnp.arange(cfg.max_features, dtype=jnp.int32))
        else:
            picked = detect.select_zone_balanced(
                kp2_xy, kps2.score, kps2.valid,
                pred.uv.astype(jnp.float32), pred.visible,
                jnp.maximum(needed, 0) * do_mm.astype(jnp.int32),
                jnp.asarray(rt.exclusion_radius, jnp.float32),
                rt.zones_in_a_row, w, h, max_new=cfg.max_features)
        new_desc = rt.frontend.describe(aux, kps2.yx[picked.kp_index])
        add_valid = picked.valid & do_mm & (needed > 0)
        state = feat_mod.add_features(
            state, rt.camera, cfg, picked.uv.astype(rt.dtype),
            new_desc, add_valid)
        return state

    def body(state, gray):
        with jax.default_matmul_precision("highest"):
            state, pred = rt.phase_predict(state)
            m, aux, in_ellipse = phase_match_mod(state, pred, gray)
            res = phase_ransac_mod(state, pred, m)
            state = update_mod(state, pred, m.z, res.inliers,
                               cfg.camera.pixel_error_x)
            if "no_repredict" in mods:
                pred2 = pred
            else:
                pred2 = meas_mod.predict_measurements(state, rt.camera)
            rescued = ransac_mod.rescue_outliers(
                pred2, m.z, res.outliers, ekf.ransac_chi2_threshold)
            state = update_mod(state, pred2, m.z, rescued,
                               cfg.camera.pixel_error_x)
            state = phase_mapman_mod(state, pred, m,
                                     res.inliers | rescued, aux, in_ellipse)
            return state, jnp.sum(m.matched.astype(jnp.int32))

    return body


def time_body(name, body, state0, frames):
    @jax.jit
    def run(st, fr):
        return jax.lax.scan(body, st, fr)

    out = run(state0, frames)
    jax.block_until_ready(out[0].x)
    t0 = time.perf_counter()
    out = run(state0, frames)
    jax.block_until_ready(out[0].x)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"  {name:26s} {dt*1e3:7.3f} ms/frame", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
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
    frames = jnp.asarray(np.concatenate([raw[30:32]] * (N_ITER // 2))[:N_ITER])

    groups = {
        "match": [
            ("FULL", set()),
            ("mask: exact block=1", {"match_exact_mask"}),
            ("mask: none", {"match_no_mask"}),
            ("no detect top-k", {"match_no_detect"}),
            ("no describe", {"match_no_describe"}),
            ("no 2nn match", {"match_no_2nn"}),
            ("no subpixel", {"match_no_subpixel"}),
        ],
        "update": [
            ("FULL", set()),
            ("no cho solve", {"upd_no_solve"}),
            ("no P downdate", {"upd_no_downdate"}),
            ("no finalize", {"upd_no_finalize"}),
            ("no re-predict", {"no_repredict"}),
        ],
        # measured inside a stubbed-matching context (matches = predictions)
        # so killing the score/planes cannot change downstream data regimes
        "precompute": [
            ("FULL", {"match_no_2nn"}),
            ("no precompute at all", {"match_no_2nn", "pre_all_fake"}),
            ("no blur+dense planes", {"match_no_2nn", "pre_fake_planes"}),
            ("no star+nms score", {"match_no_2nn", "pre_fake_score"}),
        ],
        "ransac": [
            ("FULL", set()),
            ("ransac stub", {"ransac_stub"}),
            ("no support count", {"ransac_no_support"}),
        ],
        "mapman": [
            ("FULL", set()),
            ("no zone balance", {"mm_no_zone"}),
            ("no convert", {"mm_no_convert"}),
        ],
    }
    todo = groups if which == "all" else {which: groups[which]}
    for gname, variants in todo.items():
        print(f"--- {gname} ---", flush=True)
        results = {}
        for name, mods in variants:
            results[name] = time_body(name, make_body(rt, mods), state,
                                      frames)
        full = results["FULL"]
        for name, dt in results.items():
            if name != "FULL":
                print(f"    {name:24s} delta {(full-dt)*1e3:+7.3f} ms")


if __name__ == "__main__":
    main()
