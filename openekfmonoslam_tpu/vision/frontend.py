"""Vision front-end factory: config profiles -> jittable detector/extractor.

The TPU analog of the reference's FeatureDetectorFactory /
DescriptorExtractorFactory (Configuration/ConfigurationDataReader/...):
`make_frontend(config)` resolves the configured detector and descriptor
kinds to concrete native implementations and returns one `Frontend` whose
methods are pure functions traced into the jitted SLAM step.

Contract used by engine/step.py:
    aux   = frontend.precompute(gray)        # once per frame
    score = aux["score_nms"]                 # (H, W) NMS'd corner scores
    kps   = fast.detect_keypoints(score, mask, K)   # caller-side selection
    desc  = frontend.describe(aux, kps.yx)   # (K, W) uint32 | (K, D) f32
    dist  = frontend.distance(map_desc, kp_desc)    # (F, K)

The descriptor storage spec (width/dtype) comes from
DescriptorConfig.is_binary/.width so SlamState can preallocate slots.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.vision import brief, dog, fast, floatdesc, harris
from openekfmonoslam_tpu.vision import ncc as ncc_mod
from openekfmonoslam_tpu.vision import orb as orb_mod
from openekfmonoslam_tpu.vision import star as star_mod


class Frontend:
    def __init__(self, config: SlamConfig):
        self.config = config
        det = config.detector
        desc = config.descriptor
        self.det_kind = det.kind.upper()
        self.desc_kind = desc.kind.upper()
        self.is_binary = desc.is_binary
        self.desc_width = desc.width
        self.desc_dtype = jnp.uint32 if self.is_binary else jnp.float32
        # border: widest sampling window any stage reaches past a keypoint
        self.border = max(desc.patch_size // 2 + 1, desc.orientation_radius,
                          desc.float_radius, desc.patch_radius, 4)
        if config.matcher == "ncc" and self.desc_kind != "PATCH":
            raise ValueError(
                "matcher='ncc' requires descriptor kind 'PATCH' (the state "
                f"must hold appearance patches), got {desc.kind!r}")
        if self.desc_kind == "BRIEF":
            # shared-point pool (BRISK/FREAK-style): bounds the dense
            # bit-plane pass by P=64 shifted views instead of 2*n_bits
            self._points_np, self._pairs_np = brief.make_shared_pattern(
                desc.n_bits, desc.patch_size, desc.pattern_seed)
            self._plane_margin = int(np.abs(self._points_np).max())
            self._pattern_np = None
            self.pattern = None
        elif self.desc_kind == "ORB":
            self._pattern_np = brief.make_pattern(
                desc.n_bits, desc.patch_size, desc.pattern_seed)
            self.pattern = jnp.asarray(self._pattern_np)
        else:
            self._pattern_np = None
            self.pattern = None
        self._score_fn = self._build_score_fn()

    # -- detection -----------------------------------------------------
    def _build_score_fn(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        det = self.config.detector
        kind = self.det_kind
        if kind == "FAST":
            return lambda g: fast.fast_scores(g, det.threshold)
        if kind == "STAR":
            return lambda g: star_mod.star_scores(
                g, det.star_max_size, det.star_response_threshold,
                det.star_line_threshold)
        if kind == "ORB":
            return lambda g: orb_mod.pyramid_fast_scores(
                g, det.threshold, det.orb_n_levels)
        if kind == "SIFT":
            return lambda g: dog.dog_scores(
                g, det.sift_sigma, det.sift_octave_layers,
                det.sift_contrast_threshold, det.sift_edge_threshold,
                det.sift_octaves, det.quality)
        if kind == "SURF":
            return lambda g: dog.doh_scores(g, quality=det.surf_quality)
        if kind == "HARRIS":
            return lambda g: harris.quality_threshold(
                harris.harris_scores(g, det.harris_k), det.quality)
        if kind in ("SHI_TOMASI", "SHITOMASI", "GFTT"):
            return lambda g: harris.quality_threshold(
                harris.shi_tomasi_scores(g), det.quality)
        raise ValueError(f"unknown detector kind {det.kind!r}")

    # -- per-frame precompute -------------------------------------------
    def precompute(self, gray: jnp.ndarray) -> dict:
        """Score map + descriptor support images; precision-insensitive, so
        traced at default (bf16-pass) matmul precision."""
        cfg = self.config
        with jax.default_matmul_precision("default"):
            aux: dict = {}
            if (self.det_kind == "STAR" and cfg.star_kernel
                    and cfg.detector.nonmax_radius == 2):
                # fused post-integral STAR scoring + NMS, ONE Pallas
                # pipeline on TPU (ops/star_kernel.py); interior pixels
                # identical to the XLA chain below
                from openekfmonoslam_tpu.ops.star_kernel import (
                    star_kernel_applicable, star_scores_fused)
                h, w = gray.shape
                if star_kernel_applicable(h, w,
                                          cfg.detector.star_max_size):
                    raw, nms = star_scores_fused(
                        gray, cfg.detector.star_max_size,
                        cfg.detector.star_response_threshold,
                        cfg.detector.star_line_threshold)
                    aux["score_raw"], aux["score_nms"] = raw, nms
            if "score_raw" not in aux:
                score = self._score_fn(gray)
                aux["score_raw"] = score  # pre-NMS map for subpixel fits
                aux["score_nms"] = fast.non_max_suppress(
                    score, cfg.detector.nonmax_radius)
            smoothed = brief.smooth(gray, cfg.descriptor.blur_sigma)
            if self.desc_kind == "BRIEF":
                # dense bit-planes: per-keypoint extraction is an 8-word
                # gather (the TPU fast path)
                from openekfmonoslam_tpu.ops.brief_kernel import (
                    brief_kernel_applicable, dense_planes_pallas)
                if (cfg.brief_kernel
                        and brief_kernel_applicable(smoothed,
                                                    self._points_np)):
                    # ONE Pallas launch, bit-exact with the XLA chain
                    aux["planes"] = dense_planes_pallas(
                        smoothed, self._points_np, self._pairs_np)
                else:
                    aux["planes"] = brief.dense_descriptors_shared(
                        smoothed, self._points_np, self._pairs_np)
            elif self.desc_kind == "ORB":
                aux["smoothed"] = smoothed
                m10, m01 = orb_mod.centroid_moment_maps(
                    smoothed, cfg.descriptor.orientation_radius)
                aux["m10"], aux["m01"] = m10, m01
            else:  # float / patch paths
                aux["smoothed"] = smoothed
        return aux

    # -- per-keypoint extraction -----------------------------------------
    def describe(self, aux: dict, yx: jnp.ndarray) -> jnp.ndarray:
        """(K, 2) int32 keypoints -> (K, width) descriptors."""
        with jax.default_matmul_precision("default"):
            if self.desc_kind == "BRIEF":
                return brief.lookup_descriptors(aux["planes"], yx,
                                                self._plane_margin)
            if self.desc_kind == "ORB":
                ang = orb_mod.angles_at(aux["m10"], aux["m01"], yx)
                return orb_mod.steered_extract(
                    aux["smoothed"], yx, ang, self.pattern)
            if self.desc_kind == "PATCH":
                return ncc_mod.extract_patches(
                    aux["smoothed"], yx, self.config.descriptor.patch_radius)
            return floatdesc.surf64(aux["smoothed"], yx,
                                    self.config.descriptor.float_radius)

    # -- matching distance -------------------------------------------------
    def distance(self, map_desc: jnp.ndarray, kp_desc: jnp.ndarray
                 ) -> jnp.ndarray:
        """(F, W) x (K, W) -> (F, K); Hamming for binary, squared L2 for
        float (the two branches of Matching.cpp computeDistance:47-93)."""
        if self.is_binary:
            return brief.hamming_distance(map_desc, kp_desc)
        return floatdesc.l2_distance(map_desc, kp_desc)

    def zero_descriptors(self, n: int) -> jnp.ndarray:
        return jnp.zeros((n, self.desc_width), dtype=self.desc_dtype)


def make_frontend(config: SlamConfig) -> Frontend:
    return Frontend(config)
