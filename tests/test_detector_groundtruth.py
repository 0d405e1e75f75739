"""Detector-level ground truth vs OpenCV on real s3 frames (VERDICT r2 #8).

The filter oracle can't see the vision front-end (parity is measured on
injected matches), so this bounds the one unobserved subsystem: the
corners our native JAX detectors (vision/fast.py, vision/harris.py)
produce are compared against OpenCV's implementations on real frames.

Two metrics per frame:
  * precision@3px: fraction of our top-60 detections within 3 px of ANY
    cv2 corner of the same family -- are our detections real corners?
  * top-60 overlap@3px: mutual agreement of the two top-60 rankings --
    do the strongest corners coincide?  (Score functions differ -- ours
    ranks by a different corner-response formula than cv2's -- so this is
    the looser check.)

cv2 5.x ships no xfeatures2d, so STAR (CenSurE) and SURF have no OpenCV
ground truth here; FAST and Harris cover the detection machinery
(pyramid/score/NMS/top-K) those detectors share.
"""

import dataclasses
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from openekfmonoslam_tpu.config import SlamConfig  # noqa: E402
from openekfmonoslam_tpu.vision import fast as fast_mod  # noqa: E402
from openekfmonoslam_tpu.vision.frontend import make_frontend  # noqa: E402

FRAMES_DIR = "/root/reference/experiments/s3/costado_recto1"
FRAMES = ["00001", "00120", "00400"]
K = 60

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FRAMES_DIR), reason="bundled s3 dataset not present")


def _load(name):
    from PIL import Image
    return np.asarray(
        Image.open(os.path.join(FRAMES_DIR, name + ".png")).convert("L"))


def _our_topk(img, kind, threshold):
    cfg = SlamConfig()
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, kind=kind,
                                          threshold=threshold))
    fe = make_frontend(cfg)
    aux = fe.precompute(jnp.asarray(img))
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m = fe.border
    mask = (ys >= m) & (ys < h - m) & (xs >= m) & (xs < w - m)
    kps = fast_mod.detect_keypoints(aux["score_nms"], mask, 256)
    yx = np.asarray(kps.yx)[np.asarray(kps.valid)]
    sc = np.asarray(kps.score)[np.asarray(kps.valid)]
    return yx[np.argsort(-sc)][:K]


def _min_dists(a, b):
    return np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1).min(1)


class TestFastGroundTruth:
    def test_fast_corners_are_real_cv2_corners(self):
        det = cv2.FastFeatureDetector_create(threshold=10,
                                             nonmaxSuppression=True)
        for name in FRAMES:
            img = _load(name)
            ours = _our_topk(img, "FAST", 10.0)
            cv_all = np.array([[k.pt[1], k.pt[0]]
                               for k in det.detect(img, None)])
            precision = float(np.mean(_min_dists(ours, cv_all) <= 3.0))
            print(f"{name} FAST precision@3px vs {len(cv_all)} cv2 "
                  f"corners: {precision:.2f}")
            # measured 0.97 on all three frames; lock with margin
            assert precision >= 0.90, (name, precision)

    def test_fast_top60_overlap(self):
        det = cv2.FastFeatureDetector_create(threshold=10,
                                             nonmaxSuppression=True)
        for name in FRAMES:
            img = _load(name)
            ours = _our_topk(img, "FAST", 10.0)
            cvk = sorted(det.detect(img, None), key=lambda k: -k.response)
            cv_top = np.array([[k.pt[1], k.pt[0]] for k in cvk[:K]])
            overlap = float(np.mean(_min_dists(ours, cv_top) <= 3.0))
            print(f"{name} FAST top-{K} overlap@3px: {overlap:.2f}")
            # different response formulas -> looser bound (measured
            # 0.38-0.50)
            assert overlap >= 0.30, (name, overlap)


class TestHarrisGroundTruth:
    def test_harris_top60_overlap(self):
        for name in FRAMES:
            img = _load(name)
            ours = _our_topk(img, "HARRIS", 0.0)
            g = cv2.goodFeaturesToTrack(
                img, maxCorners=K, qualityLevel=0.01, minDistance=5,
                useHarrisDetector=True, k=0.04)
            assert g is not None
            cv_top = np.array([[p[0][1], p[0][0]] for p in g])
            overlap = float(np.mean(_min_dists(ours, cv_top) <= 3.0))
            print(f"{name} HARRIS top-{K} overlap@3px: {overlap:.2f}")
            # measured 0.67-0.78
            assert overlap >= 0.55, (name, overlap)


class TestSiftGroundTruth:
    """DoG (SIFT-analog) pinned to cv2.SIFT_create() (VERDICT r4 missing
    #1): every strong detection must be a real SIFT blob.  cv2 refines
    positions to subpixel across octaves while ours reports grid
    positions from upsampled octave maps, so the 3 px metric carries the
    octave quantization (measured tail at 6-7 px = octave-2 grid); the
    8 px bound is the structural statement (measured 1.00).
    Reference: FeatureDetectorFactory.cpp:93-124 builds cv::SIFT."""

    def test_sift_detections_are_real_cv2_blobs(self):
        sift = cv2.SIFT_create()
        for name in FRAMES:
            img = _load(name)
            ours = _our_topk(img, "SIFT", 0.0)
            cv_all = np.array([[k.pt[1], k.pt[0]]
                               for k in sift.detect(img, None)])
            d = _min_dists(ours, cv_all)
            p3 = float(np.mean(d <= 3.0))
            p8 = float(np.mean(d <= 8.0))
            print(f"{name} SIFT precision@3px={p3:.2f} @8px={p8:.2f} "
                  f"vs {len(cv_all)} cv2 kps")
            # measured 0.77-0.82 @3px, 0.92-1.00 @8px on the three frames
            assert p3 >= 0.65, (name, p3)
            assert p8 >= 0.90, (name, p8)

    def test_sift_top60_overlap(self):
        sift = cv2.SIFT_create()
        for name in FRAMES:
            img = _load(name)
            ours = _our_topk(img, "SIFT", 0.0)
            cvk = sorted(sift.detect(img, None), key=lambda k: -k.response)
            cv_top = np.array([[k.pt[1], k.pt[0]] for k in cvk[:K]])
            overlap = float(np.mean(_min_dists(ours, cv_top) <= 3.0))
            print(f"{name} SIFT top-{K} overlap@3px: {overlap:.2f}")
            # different response normalizations -> loose (measured
            # 0.33-0.58)
            assert overlap >= 0.25, (name, overlap)


class TestOrbGroundTruth:
    """Pyramid-FAST/Harris (ORB detector) pinned to cv2.ORB_create()
    (VERDICT r4 missing #1).  The per-level attenuation in
    orb.pyramid_fast_scores is what makes this hold: without it the
    coarse levels' larger Harris energy put 8x-upsampled block positions
    in the top-60 (precision collapsed to 0.00 on frame 00400).
    Reference: FeatureDetectorFactory.cpp:126-129 builds cv::ORB."""

    def test_orb_detections_are_real_cv2_orb_corners(self):
        orb = cv2.ORB_create(nfeatures=500)
        for name in FRAMES:
            img = _load(name)
            ours = _our_topk(img, "ORB", 20.0)
            cv_all = np.array([[k.pt[1], k.pt[0]]
                               for k in orb.detect(img, None)])
            precision = float(np.mean(_min_dists(ours, cv_all) <= 3.0))
            print(f"{name} ORB precision@3px vs {len(cv_all)} cv2 "
                  f"corners: {precision:.2f}")
            # measured 0.87-0.95
            assert precision >= 0.80, (name, precision)

    def test_orb_top60_overlap(self):
        orb = cv2.ORB_create(nfeatures=500)
        for name in FRAMES:
            img = _load(name)
            ours = _our_topk(img, "ORB", 20.0)
            cvk = sorted(orb.detect(img, None), key=lambda k: -k.response)
            cv_top = np.array([[k.pt[1], k.pt[0]] for k in cvk[:K]])
            overlap = float(np.mean(_min_dists(ours, cv_top) <= 3.0))
            print(f"{name} ORB top-{K} overlap@3px: {overlap:.2f}")
            # measured 0.38-0.48
            assert overlap >= 0.30, (name, overlap)
