"""Detector/descriptor family tests: Harris, Shi-Tomasi, STAR, DoG/DoH,
ORB orientation + steering, SURF-64 float descriptors, and the frontend
factory driving the full engine step for every reference config profile
(FeatureDetectorFactory.cpp:51-165, DescriptorExtractorFactory.cpp:51-134).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import (DescriptorConfig, DetectorConfig,
                                        SlamConfig)
from openekfmonoslam_tpu.vision import brief, dog, fast, floatdesc, harris
from openekfmonoslam_tpu.vision import orb, star
from openekfmonoslam_tpu.vision.frontend import make_frontend


def corner_image(h=64, w=64):
    img = np.zeros((h, w), np.uint8)
    img[20:44, 20:44] = 255
    return img


def blob_image(h=64, w=64):
    """Bright Gaussian blob on dark background."""
    ys, xs = np.mgrid[:h, :w]
    img = 200.0 * np.exp(-((ys - 32) ** 2 + (xs - 32) ** 2) / (2 * 4.0 ** 2))
    return img.astype(np.uint8)


def textured_image(rng, h=96, w=96):
    img = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    img = (img.astype(np.float32) + np.roll(img, 1, 0) + np.roll(img, 1, 1)
           + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    return img.astype(np.uint8)


class TestHarris:
    def test_corners_fire_edges_dont(self):
        img = jnp.asarray(corner_image())
        score = np.asarray(harris.harris_scores(img))
        # corner pixels beat every point on the straight edge midsections
        corner_best = max(score[18:23, 18:23].max(), score[41:46, 41:46].max())
        edge_mid = score[30:34, 18:23].max()
        assert corner_best > 5 * edge_mid

    def test_shi_tomasi_flat_zero(self):
        img = jnp.full((32, 32), 77, jnp.float32)
        assert np.asarray(harris.shi_tomasi_scores(img)).max() == 0.0


class TestStar:
    def test_blob_detected_at_center(self):
        img = jnp.asarray(blob_image())
        score = np.asarray(star.star_scores(img, max_size=8,
                                            response_threshold=10.0))
        nms = np.asarray(fast.non_max_suppress(jnp.asarray(score), 3))
        ys, xs = np.nonzero(nms)
        assert len(ys) >= 1
        d = np.min(np.abs(ys - 32) + np.abs(xs - 32))
        assert d <= 3

    def test_flat_image_silent(self):
        img = jnp.full((64, 64), 100, jnp.float32)
        assert np.asarray(star.star_scores(img)).max() == 0.0

    def test_line_suppression(self):
        """A long straight step edge must not out-score a blob."""
        img = np.zeros((64, 64), np.uint8)
        img[:, 32:] = 200
        score = np.asarray(star.star_scores(jnp.asarray(img), max_size=8,
                                            response_threshold=10.0))
        blob = np.asarray(star.star_scores(jnp.asarray(blob_image()),
                                           max_size=8,
                                           response_threshold=10.0))
        assert score.max() < blob.max()


class TestDog:
    def test_blob_extremum(self):
        img = jnp.asarray(blob_image())
        score = np.asarray(dog.dog_scores(img))
        ys, xs = np.nonzero(score == score.max())
        assert abs(ys[0] - 32) <= 3 and abs(xs[0] - 32) <= 3

    def test_doh_blob(self):
        img = jnp.asarray(blob_image())
        score = np.asarray(dog.doh_scores(img))
        ys, xs = np.nonzero(score == score.max())
        assert abs(ys[0] - 32) <= 3 and abs(xs[0] - 32) <= 3

    def test_flat_silent(self):
        img = jnp.full((64, 64), 100, jnp.uint8)
        assert np.asarray(dog.dog_scores(img)).max() == 0.0


class TestOrb:
    def test_orientation_points_at_mass(self):
        """Bright half-plane to the right -> centroid angle ~ 0."""
        img = np.full((41, 41), 10.0, np.float32)
        img[:, 21:] = 200.0
        m10, m01 = orb.centroid_moment_maps(jnp.asarray(img), radius=7)
        ang = float(orb.angles_at(m10, m01,
                                  jnp.asarray([[20, 20]], jnp.int32))[0])
        assert abs(ang) < 0.2
        # bright half-plane below -> angle ~ +pi/2
        m10b, m01b = orb.centroid_moment_maps(jnp.asarray(img.T), radius=7)
        angb = float(orb.angles_at(m10b, m01b,
                                   jnp.asarray([[20, 20]], jnp.int32))[0])
        assert abs(angb - np.pi / 2) < 0.2

    def test_steering_compensates_rotation(self, rng):
        """Descriptor of a 90-degree-rotated patch matches when steering
        tracks the rotation (up to sampling noise)."""
        img = textured_image(rng, 64, 64).astype(np.float32)
        sm = np.asarray(brief.smooth(jnp.asarray(img), 2.0))
        rot = np.rot90(sm, k=-1).copy()  # 90 deg clockwise; centers map
        pattern = jnp.asarray(brief.make_pattern(256, 25))
        yx = jnp.asarray([[32, 32]], jnp.int32)
        d0 = orb.steered_extract(jnp.asarray(sm), yx,
                                 jnp.asarray([0.0]), pattern)
        d90 = orb.steered_extract(jnp.asarray(rot), yx,
                                  jnp.asarray([np.pi / 2]), pattern)
        dist_steered = int(brief.hamming_distance(d0, d90)[0, 0])
        d90_unsteered = orb.steered_extract(jnp.asarray(rot), yx,
                                            jnp.asarray([0.0]), pattern)
        dist_unsteered = int(brief.hamming_distance(d0, d90_unsteered)[0, 0])
        assert dist_steered < 60
        assert dist_steered < dist_unsteered / 2

    def test_pyramid_scores_nonempty(self):
        img = jnp.asarray(corner_image())
        score = np.asarray(orb.pyramid_fast_scores(img, 30.0, n_levels=2))
        assert (score > 0).sum() >= 4


class TestFloatDesc:
    def test_same_patch_zero_distance(self, rng):
        img = textured_image(rng)
        sm = brief.smooth(jnp.asarray(img.astype(np.float32)), 2.0)
        yx = jnp.asarray([[40, 40], [50, 55]], jnp.int32)
        d = floatdesc.surf64(sm, yx)
        assert d.shape == (2, 64)
        dist = np.asarray(floatdesc.l2_distance(d, d))
        assert dist[0, 0] < 1e-5 and dist[1, 1] < 1e-5
        assert dist[0, 1] > 1e-3  # different patches differ

    def test_unit_norm(self, rng):
        img = textured_image(rng)
        sm = brief.smooth(jnp.asarray(img.astype(np.float32)), 2.0)
        d = np.asarray(floatdesc.surf64(sm, jnp.asarray([[48, 48]],
                                                        jnp.int32)))
        assert abs(np.linalg.norm(d[0]) - 1.0) < 1e-5


PROFILES = [
    ("FAST", "BRIEF"),
    ("STAR", "BRIEF"),
    ("ORB", "ORB"),
    ("SIFT", "SURF"),
    ("SURF", "SURF"),
    ("HARRIS", "BRIEF"),
    ("SHI_TOMASI", "ORB"),
]


class TestFrontendProfiles:
    @pytest.mark.parametrize("det,desc", PROFILES)
    def test_engine_tracks_with_profile(self, rng, det, desc):
        """Init + 3 steps of the full engine under each profile: the state
        stays finite and landmarks get matched on a synthetic translation."""
        from openekfmonoslam_tpu.engine.step import SlamRuntime

        cfg = SlamConfig(
            max_features=16, max_keypoints=96, max_hypotheses=16,
            detector=DetectorConfig(
                kind=det, threshold=20.0,
                star_response_threshold=5.0, quality=0.005,
                surf_quality=0.01),
            descriptor=DescriptorConfig(kind=desc, patch_size=17),
            ekf=dataclasses.replace(
                SlamConfig().ekf, min_matches_per_image=10),
        )
        rt = SlamRuntime(cfg)
        big = np.kron(rng.integers(0, 255, (40, 44)),
                      np.ones((4, 4))).astype(np.float32)
        big = np.asarray(brief.smooth(jnp.asarray(big), 1.0))

        def frame(sx):
            return jnp.asarray(big[20:20 + 120, 20 + sx:20 + sx + 128])

        state = rt.make_initial_state()
        state = rt.init_step(state, frame(0))
        assert int(state.active.sum()) > 0
        for i in range(1, 4):
            state, rec = rt.step(state, frame(i))
            assert np.isfinite(np.asarray(state.x)).all()
            assert np.isfinite(np.asarray(rec.P_cam)).all()
        # at least some guided matches happened over the run
        assert int(rec.total_matches) > 0
