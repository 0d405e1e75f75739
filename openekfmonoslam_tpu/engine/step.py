"""The full per-frame SLAM step as a single jittable function.

This is the TPU re-design of EKF::step (EKF.cpp:242-666) -- the reference's
seven sequential phases (predict, measurement prediction, matching, 1-point
RANSAC, low-innovation update, outlier rescue, high-innovation update, map
management) fused into one traced program over statically-shaped slot
arrays.  EKF::init (EKF.cpp:170-237) is `init_step`.

Data flow per frame (phase -> reference location):
  1  predict                 StateAndCovariancePrediction.cpp:244
  2  predict measurements    MeasurementPrediction.cpp:705
  3  detect + describe       Matching.cpp:204-210 (masked to gate ellipses)
  4  guided matching         Matching.cpp:181-264
  5  1-point RANSAC          1PointRansac.cpp:101
  6  update (low innov)      Update.cpp:282 via EKF.cpp:430
  7  re-predict + rescue     EKF.cpp:443-506
  8  update (high innov)     EKF.cpp:522-540
  9  map management          EKF.cpp:546-612
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter import features as feat_mod
from openekfmonoslam_tpu.filter import mapman
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter import predict as pred_mod
from openekfmonoslam_tpu.filter import ransac as ransac_mod
from openekfmonoslam_tpu.filter import update as upd_mod
from openekfmonoslam_tpu.filter.state import SlamState, make_initial_state
from openekfmonoslam_tpu.vision import detect, fast, matching, ncc
from openekfmonoslam_tpu.vision.frontend import make_frontend


class StepRecord(NamedTuple):
    """Per-frame observables (the output.yml record, EKF.cpp:405-628)."""

    x_cam: jnp.ndarray          # (13,) camera state
    P_cam: jnp.ndarray          # (13, 13) camera covariance corner
    total_matches: jnp.ndarray  # () int32
    li_inliers: jnp.ndarray     # () int32 low-innovation inliers
    hi_inliers: jnp.ndarray     # () int32 rescued (high-innovation)
    n_active: jnp.ndarray       # () int32 live landmarks
    n_visible: jnp.ndarray      # () int32 predicted-visible landmarks
    pred_uv: jnp.ndarray        # (F, 2) predicted pixels (overlay/eval)
    pred_S: jnp.ndarray         # (F, 2, 2) innovation covariances
    visible: jnp.ndarray        # (F,) bool
    z: jnp.ndarray              # (F, 2) matched pixels
    matched: jnp.ndarray        # (F,) bool
    inliers: jnp.ndarray        # (F,) bool (low + high innovation)
    # new-feature additions this frame (the injection log for replay /
    # oracle parity): candidate pixels, which were added, and into which slot
    new_uv: jnp.ndarray         # (C, 2)
    new_ok: jnp.ndarray         # (C,) bool: actually added
    new_slot: jnp.ndarray       # (C,) int32 slot id (F = dropped)


class SlamRuntime:
    """Static per-run context: config scalars, camera, vision front-end.

    Everything here is baked into the jitted step as constants.  The
    detector/descriptor pair is resolved once by the front-end factory
    (vision/frontend.py), the TPU analog of the reference's
    FeatureDetectorFactory / DescriptorExtractorFactory.
    """

    def __init__(self, config: SlamConfig):
        self.config = config
        self.dtype = jnp.float64 if config.dtype == "float64" else jnp.float32
        self.camera = Camera.from_calibration(config.camera, self.dtype)
        self.frontend = make_frontend(config)
        self.gate = (config.gate_scale ** 2) * config.chi2_95_2
        ekf = config.ekf
        self.exclusion_radius = config.gate_scale * float(
            jnp.sqrt(ekf.detect_new_features_image_mask_ellipse_size
                     * config.chi2_95_2))
        self.zones_in_a_row = int(
            2 ** ekf.detect_new_features_image_areas_divide_times)
        # bug-compatible mode (config.reference_quirks): quirky H chain,
        # DELTA deadband, insertion-order RANSAC visit + conversion scan
        self.quirks = bool(config.reference_quirks)
        self.hp_layout = config.hp_layout
        self.measure_kernel = bool(config.measure_kernel)
        self.update_kernel = bool(config.update_kernel)
        self.predict_kernel = bool(config.predict_kernel)

    def _border_mask(self, shape):
        h, w = shape
        m = self.frontend.border
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        return (ys >= m) & (ys < h - m) & (xs >= m) & (xs < w - m)

    # ------------------------------------------------------------------
    def init_step(self, state: SlamState, gray: jnp.ndarray) -> SlamState:
        """EKF::init (EKF.cpp:170-237): detect MinMatchesPerImage features
        zone-balanced over the whole image and add them to the map."""
        # TPU matmuls default to single-pass bf16; the covariance algebra
        # needs real f32 accumulation or P loses positive-definiteness
        # within ~50 frames.  config.matmul_precision picks the pass
        # count: "high" (3-pass, default -- measured drift-equivalent to
        # 6-pass on the s3 run at ~4% more fps) or "highest" (6-pass).
        with jax.default_matmul_precision(self.config.matmul_precision):
            return self._init_step_impl(state, gray)[0]

    def init_step_recorded(self, state: SlamState, gray: jnp.ndarray
                           ) -> tuple[SlamState, jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
        """init_step returning (state, uv, ok, slot) of the features added
        -- the bootstrap entry of the replay/oracle injection log."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            return self._init_step_impl(state, gray)

    def _init_step_impl(self, state: SlamState, gray: jnp.ndarray):
        cfg = self.config
        aux = self.frontend.precompute(gray)
        kps = fast.detect_keypoints(aux["score_nms"],
                                    self._border_mask(gray.shape),
                                    cfg.max_keypoints)
        kp_xy = jnp.stack([kps.yx[:, 1], kps.yx[:, 0]], axis=-1)  # (x, y)

        no_pred = jnp.zeros((1, 2), dtype=jnp.float32)
        picked = detect.select_zone_balanced(
            kp_xy.astype(jnp.float32), kps.score, kps.valid,
            no_pred, jnp.zeros((1,), bool),
            jnp.int32(cfg.ekf.min_matches_per_image),
            jnp.asarray(self.exclusion_radius, jnp.float32),
            self.zones_in_a_row, gray.shape[1], gray.shape[0],
            max_new=cfg.max_features)

        desc = self.frontend.describe(aux, kps.yx[picked.kp_index])
        slots, ok = feat_mod.assign_slots(state.active, picked.valid)
        state = feat_mod.add_features(
            state, self.camera, cfg,
            picked.uv.astype(self.dtype), desc, picked.valid)
        return state, picked.uv.astype(self.dtype), ok, slots

    # ------------------------------------------------------------------
    def step(self, state: SlamState, gray: jnp.ndarray
             ) -> tuple[SlamState, StepRecord]:
        """One full frame (EKF::step, EKF.cpp:242-666)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            return self._step_impl(state, gray)

    # -- the seven reference phases as separable jittable functions --
    # (the per-frame timing taxonomy of EKF.cpp:255-618; the fused default
    # path below calls them back to back inside one traced program, the
    # engine's phase-timing mode jits each one separately)

    def phase_predict(self, state: SlamState):
        """[1] predict + measurement prediction (the reference's
        'Prediction' bracket covers both, EKF.cpp:273-292)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            state = state._replace(frame=state.frame + 1)
            state = pred_mod.predict(state, self.config,
                                     use_kernel=self.predict_kernel)
            pred = meas_mod.predict_measurements(state, self.camera,
                                                 quirks=self.quirks,
                                                 hp_layout=self.hp_layout,
                                                 use_kernel=self.measure_kernel)
            return state, pred

    def phase_match(self, state: SlamState, pred, gray: jnp.ndarray):
        """[2] guided matching ('Matching', EKF.cpp:330-345): front-end
        precompute, gate-region mask, detection, gated 2-NN (or NCC)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            cfg = self.config
            aux = self.frontend.precompute(gray)
            in_ellipse = matching.ellipse_union_mask(
                gray.shape, pred.uv, pred.S, pred.visible, self.gate)
            if cfg.matcher == "ncc":
                # detection-free active search: correlate each landmark's
                # stored patch over its gate region (vision/ncc.py),
                # optionally against homography-warped templates
                corr_patches = None
                if cfg.ncc_warp:
                    cam = self.camera
                    corr_patches = ncc.warp_templates(
                        state.descriptors, state.patch_pose,
                        state.features, state.is_xyz, state.x[:7],
                        pred.uv, pred.visible,
                        cam.fx, cam.fy, cam.cx, cam.cy,
                        cfg.descriptor.patch_radius)
                m = ncc.ncc_match(
                    aux["smoothed"], pred.uv, pred.S, pred.visible,
                    state.descriptors, self.gate,
                    cfg.descriptor.patch_radius,
                    cfg.ncc_search_radius, cfg.ncc_min_corr,
                    refresh_below=cfg.ncc_refresh_below,
                    corr_patches=corr_patches)
            else:
                kps = fast.detect_keypoints(
                    aux["score_nms"],
                    in_ellipse & self._border_mask(gray.shape),
                    cfg.max_keypoints)
                kp_xy = jnp.stack([kps.yx[:, 1], kps.yx[:, 0]],
                                  axis=-1).astype(self.dtype)
                kp_desc = self.frontend.describe(aux, kps.yx)
                m = matching.match_predictions(
                    pred.uv, pred.S, pred.visible, state.descriptors,
                    kp_xy, kps.valid, kp_desc, self.gate,
                    cfg.ekf.matching_comp_coef_second_best_vs_first,
                    distance_fn=self.frontend.distance)
                if cfg.subpixel_matches:
                    z_sub = fast.subpixel_refine(
                        aux["score_raw"].astype(self.dtype), m.z, m.matched)
                    m = m._replace(z=z_sub)
            return m, aux, in_ellipse

    def phase_ransac(self, state: SlamState, pred, m):
        """[3] 1-point RANSAC ('Ransac', EKF.cpp:400-417)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            cfg = self.config
            return ransac_mod.ransac(
                state, pred, m.z, m.matched, self.camera,
                cfg.ekf.ransac_threshold_predict_distance,
                cfg.ekf.ransac_all_inliers_probability,
                cfg.camera.pixel_error_x,
                cfg.max_hypotheses, cfg.ransac_parity_visit,
                visit_key=state.birth if self.quirks else None,
                deadband=self.quirks)

    def phase_update_li(self, state: SlamState, pred, m, inliers):
        """[4] low-innovation joint update ('UpdateLI', EKF.cpp:423-437)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            return upd_mod.update(state, pred, m.z, inliers,
                                  self.config.camera.pixel_error_x,
                                  deadband=self.quirks,
                                  use_kernel=self.update_kernel)

    def phase_rescue(self, state: SlamState, m, outliers):
        """[5] re-predict + chi2 outlier rescue ('RescueOutliers',
        EKF.cpp:443-517)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            pred2 = meas_mod.predict_measurements(state, self.camera,
                                                  quirks=self.quirks,
                                                  hp_layout=self.hp_layout,
                                                  use_kernel=self.measure_kernel)
            rescued = ransac_mod.rescue_outliers(
                pred2, m.z, outliers, self.config.ekf.ransac_chi2_threshold)
            return pred2, rescued

    def phase_update_hi(self, state: SlamState, pred2, m, rescued):
        """[6] high-innovation joint update ('UpdateHI', EKF.cpp:522-540)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            return upd_mod.update(state, pred2, m.z, rescued,
                                  self.config.camera.pixel_error_x,
                                  deadband=self.quirks,
                                  use_kernel=self.update_kernel)

    def mapman_maintain(self, state: SlamState, pred, m, inliers_all
                        ) -> tuple[SlamState, jnp.ndarray, jnp.ndarray]:
        """Map maintenance minus the rare paths: counters + bad-ratio and
        unseen-pressure culls (MapManagement.cpp:74-307, EKF.cpp:567-586).
        Returns (state, do_mm, needed); every op is mask arithmetic, so
        this part vmaps cleanly (parallel/batch_runner)."""
        cfg = self.config
        ekf = cfg.ekf
        state = mapman.update_counters(state, pred.visible, inliers_all,
                                       m.desc, m.refreshed)
        do_mm = jnp.logical_and(
            ekf.map_management_frequency > 0,
            state.frame % max(ekf.map_management_frequency, 1) == 0)
        needed = jnp.int32(ekf.min_matches_per_image) - jnp.sum(
            inliers_all.astype(jnp.int32))

        # remove low-ratio features (removeBadMapFeatures)
        bad = mapman.bad_feature_mask(
            state, ekf.good_feature_matching_percent)
        state = mapman.remove_features(state, bad & do_mm)

        # remove unseen under pressure (EKF.cpp:582-586)
        pressure = mapman.map_pressure(
            state, needed, ekf.always_remove_unseen_map_features,
            ekf.max_map_features_count, ekf.max_map_size)
        unseen = state.active & ~pred.visible
        state = mapman.remove_features(state, unseen & pressure & do_mm)
        return state, do_mm, needed

    def detect_candidates(self, state: SlamState, pred, aux, in_ellipse,
                          needed):
        """New-feature detection + zone balancing + description, NO gate
        (detectNewImageFeatures, DetectNewImageFeatures.cpp:323-419).
        Returns (uv (C,2) f32, desc (C,W), valid (C,) bool)."""
        cfg = self.config
        h, w = aux["score_nms"].shape
        out_mask = ~in_ellipse & self._border_mask((h, w))
        kps2 = fast.detect_keypoints(aux["score_nms"], out_mask,
                                     cfg.max_keypoints)
        kp2_xy = jnp.stack([kps2.yx[:, 1], kps2.yx[:, 0]],
                           axis=-1).astype(jnp.float32)
        picked = detect.select_zone_balanced(
            kp2_xy, kps2.score, kps2.valid,
            pred.uv.astype(jnp.float32), pred.visible,
            jnp.maximum(needed, 0),
            jnp.asarray(self.exclusion_radius, jnp.float32),
            self.zones_in_a_row, w, h,
            max_new=cfg.max_features)
        new_desc = self.frontend.describe(aux, kps2.yx[picked.kp_index])
        return picked.uv, new_desc, picked.valid

    def phase_mapman(self, state: SlamState, pred, m, inliers_all, aux,
                     in_ellipse):
        """[7] map management ('MapManagement', EKF.cpp:546-612): counters,
        culls, conversion, new-feature detection + addition.

        Returns (state, new_uv, new_ok, new_slot)."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            cfg = self.config
            ekf = cfg.ekf

            state, do_mm, needed = self.mapman_maintain(
                state, pred, m, inliers_all)

            # convert at most one inverse-depth feature to XYZ (gated
            # inline -- a lax.cond here costs ~36 un-fusable kernels)
            state = mapman.convert_one_to_xyz(
                state, ekf.inverse_depth_linearity_index_threshold,
                enable=do_mm,
                order_key=state.birth if self.quirks else None)

            # detect + add new features away from the frame-start ellipses.
            # Tracking-healthy frames (matches >= MinMatchesPerImage, the
            # common case) need no new features: the second top-K
            # detection, the zone balancing, and the descriptor lookups
            # are branched out entirely then (~50 us/frame).  Only the
            # small candidate arrays pass through the cond -- threading
            # the whole state (with its (N,N) P) through the branch cost
            # ~20 us/frame of cond carry copies; the state-touching
            # add_features runs outside, behind its own any(ok) branch.
            C = cfg.max_features

            def _detect(aux, in_ellipse):
                return self.detect_candidates(state, pred, aux, in_ellipse,
                                              needed)

            def _no_detect(aux, in_ellipse):
                desc_shape = (C,) + state.descriptors.shape[1:]
                return (jnp.zeros((C, 2), jnp.float32),
                        jnp.zeros(desc_shape, state.descriptors.dtype),
                        jnp.zeros((C,), bool))

            cand_uv, cand_desc, cand_valid = jax.lax.cond(
                do_mm & (needed > 0), _detect, _no_detect, aux, in_ellipse)
            new_slot, new_ok = feat_mod.assign_slots(state.active,
                                                     cand_valid)
            state = feat_mod.add_features(
                state, self.camera, cfg, cand_uv.astype(self.dtype),
                cand_desc, cand_valid)
            return state, cand_uv.astype(self.dtype), new_ok, new_slot

    def _step_impl(self, state: SlamState, gray: jnp.ndarray
                   ) -> tuple[SlamState, StepRecord]:
        state, pred = self.phase_predict(state)
        m, aux, in_ellipse = self.phase_match(state, pred, gray)
        res = self.phase_ransac(state, pred, m)
        state = self.phase_update_li(state, pred, m, res.inliers)
        pred2, rescued = self.phase_rescue(state, m, res.outliers)
        state = self.phase_update_hi(state, pred2, m, rescued)
        inliers_all = res.inliers | rescued
        state, new_uv, new_ok, new_slot = self.phase_mapman(
            state, pred, m, inliers_all, aux, in_ellipse)

        record = StepRecord(
            x_cam=state.x[:13],
            P_cam=state.P[:13, :13],
            total_matches=jnp.sum(m.matched.astype(jnp.int32)),
            li_inliers=jnp.sum(res.inliers.astype(jnp.int32)),
            hi_inliers=jnp.sum(rescued.astype(jnp.int32)),
            n_active=jnp.sum(state.active.astype(jnp.int32)),
            n_visible=jnp.sum(pred.visible.astype(jnp.int32)),
            pred_uv=pred.uv,
            pred_S=pred.S,
            visible=pred.visible,
            z=m.z,
            matched=m.matched,
            inliers=inliers_all,
            new_uv=new_uv,
            new_ok=new_ok,
            new_slot=new_slot,
        )
        return state, record

    def make_record(self, state: SlamState, pred, m, res, rescued,
                    new_uv, new_ok, new_slot) -> StepRecord:
        """Assemble a StepRecord from phase outputs (phase-timing mode)."""
        inliers_all = res.inliers | rescued
        return StepRecord(
            x_cam=state.x[:13],
            P_cam=state.P[:13, :13],
            total_matches=jnp.sum(m.matched.astype(jnp.int32)),
            li_inliers=jnp.sum(res.inliers.astype(jnp.int32)),
            hi_inliers=jnp.sum(rescued.astype(jnp.int32)),
            n_active=jnp.sum(state.active.astype(jnp.int32)),
            n_visible=jnp.sum(pred.visible.astype(jnp.int32)),
            pred_uv=pred.uv,
            pred_S=pred.S,
            visible=pred.visible,
            z=m.z,
            matched=m.matched,
            inliers=inliers_all,
            new_uv=new_uv,
            new_ok=new_ok,
            new_slot=new_slot,
        )

    # ------------------------------------------------------------------
    def step_injected(self, state: SlamState, z: jnp.ndarray,
                      matched: jnp.ndarray,
                      new_uv: jnp.ndarray | None = None,
                      new_desc: jnp.ndarray | None = None,
                      new_valid: jnp.ndarray | None = None,
                      new_slot: jnp.ndarray | None = None
                      ) -> tuple[SlamState, StepRecord]:
        """The filter pipeline with *injected* per-slot measurements.

        The TPU analog of the reference's HandMatching replay harness
        (HandMatching.cpp:37-99): run predict / RANSAC / updates / map
        maintenance on externally supplied matches, decoupling the filter
        math from the vision front-end for golden tests and offline replay.
        ``z`` is (F, 2) measured pixels for ``matched`` slots; optional
        new-feature candidates are added afterwards.  ``new_slot`` pins
        each candidate to the log's recorded slot id (the replay must
        reproduce the recorder's slot layout even when this run's
        map-management decisions diverge, e.g. under reference_quirks --
        the log's measurements are keyed by the recorder's slots);
        None falls back to fresh lowest-free assignment.
        """
        with jax.default_matmul_precision(self.config.matmul_precision):
            cfg = self.config
            ekf = cfg.ekf
            cam = self.camera
            pixel_error = cfg.camera.pixel_error_x

            state = state._replace(frame=state.frame + 1)
            state = pred_mod.predict(state, cfg,
                                     use_kernel=self.predict_kernel)
            pred = meas_mod.predict_measurements(state, cam,
                                                 quirks=self.quirks,
                                                 hp_layout=self.hp_layout,
                                                 use_kernel=self.measure_kernel)
            matched = matched & pred.visible
            z = z.astype(self.dtype)

            res = ransac_mod.ransac(
                state, pred, z, matched, cam,
                ekf.ransac_threshold_predict_distance,
                ekf.ransac_all_inliers_probability, pixel_error,
                cfg.max_hypotheses, cfg.ransac_parity_visit,
                visit_key=state.birth if self.quirks else None,
                deadband=self.quirks)
            state = upd_mod.update(state, pred, z, res.inliers, pixel_error,
                                   deadband=self.quirks,
                                   use_kernel=self.update_kernel)
            pred2 = meas_mod.predict_measurements(state, cam,
                                                  quirks=self.quirks,
                                                  hp_layout=self.hp_layout,
                                                  use_kernel=self.measure_kernel)
            rescued = ransac_mod.rescue_outliers(
                pred2, z, res.outliers, ekf.ransac_chi2_threshold)
            state = upd_mod.update(state, pred2, z, rescued, pixel_error,
                                   deadband=self.quirks,
                                   use_kernel=self.update_kernel)
            inliers_all = res.inliers | rescued

            # map management mirrors the live pipeline (EKF.cpp:567-612):
            # counters every frame; cull/convert under the frequency gate
            state = mapman.update_counters(state, pred.visible, inliers_all,
                                           state.descriptors)
            do_mm = jnp.logical_and(
                ekf.map_management_frequency > 0,
                state.frame % max(ekf.map_management_frequency, 1) == 0)
            needed = jnp.int32(ekf.min_matches_per_image) - jnp.sum(
                inliers_all.astype(jnp.int32))

            bad = mapman.bad_feature_mask(
                state, ekf.good_feature_matching_percent)
            state = mapman.remove_features(state, bad & do_mm)

            pressure = mapman.map_pressure(
                state, needed, ekf.always_remove_unseen_map_features,
                ekf.max_map_features_count, ekf.max_map_size)
            unseen = state.active & ~pred.visible
            state = mapman.remove_features(state, unseen & pressure & do_mm)

            state = mapman.convert_one_to_xyz(
                state, ekf.inverse_depth_linearity_index_threshold,
                enable=do_mm,
                order_key=state.birth if self.quirks else None)

            C = cfg.max_features
            if new_uv is not None:
                if new_desc is None:
                    new_desc = jnp.zeros(
                        (new_uv.shape[0],) + state.descriptors.shape[1:],
                        state.descriptors.dtype)
                # the live path only adds when map management ran AND the
                # inlier count fell short (EKF.cpp:597-611); the replayed
                # log's additions must pass the same gate, because this
                # run's inlier decisions can differ from the recording
                # run's (e.g. quirks on vs off)
                new_valid = new_valid & do_mm & (needed > 0)
                if new_slot is not None:
                    new_ok = new_valid
                    state = feat_mod.add_features_at(
                        state, cam, cfg, new_uv.astype(self.dtype),
                        new_desc, new_slot, new_valid)
                else:
                    new_slot, new_ok = feat_mod.assign_slots(state.active,
                                                             new_valid)
                    state = feat_mod.add_features(
                        state, cam, cfg, new_uv.astype(self.dtype),
                        new_desc, new_valid)
                rec_uv = jnp.zeros((C, 2), self.dtype).at[
                    :new_uv.shape[0]].set(new_uv.astype(self.dtype))
                rec_ok = jnp.zeros((C,), bool).at[:new_ok.shape[0]].set(
                    new_ok)
                rec_slot = jnp.full((C,), state.n_features, jnp.int32).at[
                    :new_slot.shape[0]].set(new_slot)
            else:
                rec_uv = jnp.zeros((C, 2), self.dtype)
                rec_ok = jnp.zeros((C,), bool)
                rec_slot = jnp.full((C,), state.n_features, jnp.int32)

            record = StepRecord(
                x_cam=state.x[:13],
                P_cam=state.P[:13, :13],
                total_matches=jnp.sum(matched.astype(jnp.int32)),
                li_inliers=jnp.sum(res.inliers.astype(jnp.int32)),
                hi_inliers=jnp.sum(rescued.astype(jnp.int32)),
                n_active=jnp.sum(state.active.astype(jnp.int32)),
                n_visible=jnp.sum(pred.visible.astype(jnp.int32)),
                pred_uv=pred.uv,
                pred_S=pred.S,
                visible=pred.visible,
                z=z,
                matched=matched,
                inliers=inliers_all,
                new_uv=rec_uv,
                new_ok=rec_ok,
                new_slot=rec_slot,
            )
            return state, record

    # ------------------------------------------------------------------
    def make_initial_state(self) -> SlamState:
        return make_initial_state(self.config, self.dtype)

    def jitted(self):
        """(init_fn, step_fn) jit-compiled."""
        return jax.jit(self.init_step), jax.jit(self.step)
