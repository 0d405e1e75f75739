"""Vision front-end tests: FAST corners, BRIEF descriptors, gated matching,
zone-balanced selection -- on small synthetic images."""

import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.vision import brief, detect, fast, matching


def checkerboard_corner_image(h=64, w=64):
    """A white square on black: strong corners at the 4 square corners."""
    img = np.zeros((h, w), np.uint8)
    img[20:44, 20:44] = 255
    return img


def random_texture(rng, h=96, w=96):
    img = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    # low-pass a bit so BRIEF tests have structure
    img = (img.astype(np.float32) + np.roll(img, 1, 0) + np.roll(img, 1, 1)
           + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    return img.astype(np.uint8)


class TestFast:
    def test_detects_square_corners(self):
        img = checkerboard_corner_image()
        score = np.asarray(fast.fast_scores(jnp.asarray(img), 30.0))
        nms = np.asarray(fast.non_max_suppress(jnp.asarray(score)))
        ys, xs = np.nonzero(nms)
        assert len(ys) >= 4
        # each true corner has a detection within 3 px
        for cy, cx in [(20, 20), (20, 43), (43, 20), (43, 43)]:
            d = np.min(np.abs(ys - cy) + np.abs(xs - cx))
            assert d <= 3, (cy, cx, d)

    def test_flat_image_no_corners(self):
        img = np.full((32, 32), 128, np.uint8)
        score = np.asarray(fast.fast_scores(jnp.asarray(img), 20.0))
        assert np.all(score == 0)

    def test_contiguous_arc_semantics(self):
        # exactly 9 contiguous bits -> corner; 8 -> not
        m9 = jnp.uint32(0b0000000111111111)
        m8 = jnp.uint32(0b0000000011111111)
        assert bool(fast._contiguous_arc(m9))
        assert not bool(fast._contiguous_arc(m8))
        # wrap-around run
        mwrap = jnp.uint32(0b1111000000011111)   # 4 + 5 = 9 circular
        assert bool(fast._contiguous_arc(mwrap))

    def test_topk_detect(self):
        img = checkerboard_corner_image()
        score = fast.non_max_suppress(fast.fast_scores(jnp.asarray(img), 30.0))
        kps = fast.detect_keypoints(score, jnp.ones_like(score, dtype=bool),
                                    16)
        v = np.asarray(kps.valid)
        assert v.sum() >= 4
        assert np.all(np.asarray(kps.score)[v] > 0)


class TestBrief:
    def test_descriptor_stable_under_translation(self, rng):
        img = random_texture(rng)
        sm = brief.smooth(jnp.asarray(img))
        pattern = jnp.asarray(brief.make_pattern())
        yx = jnp.asarray([[48, 48]], jnp.int32)
        d1 = brief.extract(sm, yx, pattern)
        # same content shifted by (5, 3): descriptor at shifted location equal
        img2 = np.roll(np.roll(img, 5, 0), 3, 1)
        sm2 = brief.smooth(jnp.asarray(img2))
        d2 = brief.extract(sm2, jnp.asarray([[53, 51]], jnp.int32), pattern)
        dist = int(brief.hamming_distance(d1, d2)[0, 0])
        assert dist <= 16, dist

    def test_different_points_differ(self, rng):
        img = random_texture(rng)
        sm = brief.smooth(jnp.asarray(img))
        pattern = jnp.asarray(brief.make_pattern())
        d = brief.extract(sm, jnp.asarray([[30, 30], [60, 60]], jnp.int32),
                          pattern)
        dist = int(brief.hamming_distance(d[:1], d[1:])[0, 0])
        assert dist > 40

    def test_hamming_distance_exact(self):
        a = jnp.asarray([[0b1011, 0]], jnp.uint32)
        b = jnp.asarray([[0b0010, 1]], jnp.uint32)
        assert int(brief.hamming_distance(a, b)[0, 0]) == 3


class TestSharedBrief:
    """Shared-point pool pattern (the dense-plane fast path's pattern)."""

    def test_pattern_shapes(self):
        points, pairs = brief.make_shared_pattern(256, 33, 7, 64)
        assert points.shape == (64, 2) and pairs.shape == (256, 2)
        assert len({tuple(p) for p in points}) == 64
        assert (pairs[:, 0] != pairs[:, 1]).all()
        assert np.abs(points).max() <= 16
        # every pool point participates (expected ~8 uses each)
        assert len(np.unique(pairs)) == 64

    def test_dense_matches_sparse(self, rng):
        img = random_texture(rng)
        sm = brief.smooth(jnp.asarray(img))
        points, pairs = brief.make_shared_pattern()
        planes = brief.dense_descriptors_shared(sm, points, pairs)
        yx = jnp.asarray([[40, 40], [30, 70], [70, 25]], jnp.int32)
        d_dense = brief.lookup_descriptors(
            planes, yx, margin=int(np.abs(points).max()))
        d_sparse = brief.extract_shared(sm, yx, points, pairs)
        np.testing.assert_array_equal(np.asarray(d_dense),
                                      np.asarray(d_sparse))

    def test_stable_under_translation(self, rng):
        img = random_texture(rng)
        points, pairs = brief.make_shared_pattern()
        sm = brief.smooth(jnp.asarray(img))
        d1 = brief.extract_shared(sm, jnp.asarray([[48, 48]], jnp.int32),
                                  points, pairs)
        img2 = np.roll(np.roll(img, 5, 0), 3, 1)
        sm2 = brief.smooth(jnp.asarray(img2))
        d2 = brief.extract_shared(sm2, jnp.asarray([[53, 51]], jnp.int32),
                                  points, pairs)
        assert int(brief.hamming_distance(d1, d2)[0, 0]) <= 16

    def test_discriminative(self, rng):
        img = random_texture(rng)
        points, pairs = brief.make_shared_pattern()
        sm = brief.smooth(jnp.asarray(img))
        d = brief.extract_shared(
            sm, jnp.asarray([[30, 30], [60, 60]], jnp.int32), points, pairs)
        assert int(brief.hamming_distance(d[:1], d[1:])[0, 0]) > 40


class TestMatching:
    def test_gate_and_nearest(self, rng):
        F, K, W = 3, 8, 8
        pred_uv = jnp.asarray([[10., 10.], [50., 50.], [90., 90.]])
        S = jnp.tile(jnp.eye(2) * 4.0, (F, 1, 1))   # sigma = 2px
        visible = jnp.asarray([True, True, False])
        kp_xy = jnp.asarray([[11., 10.], [48., 52.], [90., 91.],
                             [200., 200.]] + [[0., 0.]] * 4)
        kp_valid = jnp.asarray([True, True, True, True] + [False] * 4)
        rng_np = np.random.default_rng(0)
        map_desc = jnp.asarray(
            rng_np.integers(0, 2**32, size=(F, W), dtype=np.uint32))
        kp_desc = jnp.zeros((K, W), jnp.uint32)
        kp_desc = kp_desc.at[0].set(map_desc[0])
        kp_desc = kp_desc.at[1].set(map_desc[1])
        kp_desc = kp_desc.at[2].set(map_desc[2])

        m = matching.match_predictions(
            pred_uv, S, visible, map_desc, kp_xy, kp_valid, kp_desc,
            gate=4 * 5.9915, ratio_coef=1.0)
        got = np.asarray(m.matched)
        assert got[0] and got[1]
        assert not got[2]      # not visible
        np.testing.assert_allclose(np.asarray(m.z)[0], [11., 10.])
        np.testing.assert_allclose(np.asarray(m.z)[1], [48., 52.])

    def test_ellipse_union_mask(self):
        S = jnp.asarray([[[25.0, 0.0], [0.0, 4.0]]])   # 5px x 2px sigma
        centers = jnp.asarray([[32.0, 16.0]])
        mask = np.asarray(matching.ellipse_union_mask(
            (32, 64), centers, S, jnp.asarray([True]), gate=5.9915,
            block=1))
        assert mask[16, 32]
        # x extent ~ sqrt(25 * 5.99) ~ 12.2; y extent ~ 4.9
        assert mask[16, 32 + 11] and not mask[16, 32 + 14]
        assert mask[16 + 4, 32] and not mask[16 + 6, 32]
        # invisible -> empty
        mask2 = np.asarray(matching.ellipse_union_mask(
            (32, 64), centers, S, jnp.asarray([False]), gate=5.9915,
            block=1))
        assert not mask2.any()

    def test_blocked_mask_is_dilated_superset(self):
        """The default blocked mask must cover every exact-member pixel
        (it only routes detection budget; over-coverage is harmless)."""
        S = jnp.asarray([[[25.0, 0.0], [0.0, 4.0]]],)
        centers = jnp.asarray([[33.0, 17.0]])   # off-block-center
        exact = np.asarray(matching.ellipse_union_mask(
            (32, 64), centers, S, jnp.asarray([True]), gate=5.9915,
            block=1))
        blocked = np.asarray(matching.ellipse_union_mask(
            (32, 64), centers, S, jnp.asarray([True]), gate=5.9915,
            block=4))
        assert (blocked | ~exact).all()       # exact subset of blocked
        # and not the whole image
        assert blocked.sum() < blocked.size * 0.5

    def test_blocked_mask_superset_tiny_and_thin_gates(self, rng):
        """ADVICE round 1: a converged landmark's gate ellipse can be
        smaller than one block (or pencil-thin); the blocked mask must
        still cover every exact-member pixel."""
        cases = [
            [[0.3, 0.0], [0.0, 0.2]],       # sub-pixel sigma: tiny gate
            [[1.2, 0.0], [0.0, 0.9]],       # semi-axes ~ 2.7 x 2.3 px
            [[16.0, 0.0], [0.0, 0.04]],     # thin: 10 x 0.5 px
            [[9.0, 5.0], [5.0, 4.0]],       # correlated/tilted
        ]
        for Sv in cases:
            for center in ([33.1, 17.7], [16.0, 16.0], [34.9, 18.9]):
                S = jnp.asarray([Sv])
                centers = jnp.asarray([center])
                exact = np.asarray(matching.ellipse_union_mask(
                    (40, 64), centers, S, jnp.asarray([True]), gate=5.9915,
                    block=1))
                blocked = np.asarray(matching.ellipse_union_mask(
                    (40, 64), centers, S, jnp.asarray([True]), gate=5.9915,
                    block=4))
                assert exact.any(), (Sv, center)
                assert (blocked | ~exact).all(), (Sv, center)


class TestZoneBalance:
    def test_spreads_across_zones(self, rng):
        # 16 candidates clustered in one zone + 3 lone ones elsewhere
        xy = [[5 + i, 5 + (i * 3) % 11] for i in range(16)]
        xy += [[40, 10], [10, 44], [50, 50]]
        kp_xy = jnp.asarray(np.array(xy, np.float32))
        score = jnp.asarray(np.linspace(10, 20, len(xy)).astype(np.float32))
        avail = jnp.ones(len(xy), bool)
        picked = detect.select_zone_balanced(
            kp_xy, score, avail,
            jnp.zeros((1, 2), jnp.float32), jnp.zeros((1,), bool),
            needed=jnp.int32(4), exclusion_radius=jnp.float32(2.0),
            zones_in_a_row=2, image_w=64, image_h=64, max_new=8)
        v = np.asarray(picked.valid)
        assert v.sum() == 4
        uv = np.asarray(picked.uv)[v]
        zones = {(int(x) // 32, int(y) // 32) for x, y in uv}
        # all four occupied zones got one feature each
        assert len(zones) == 4

    def test_exclusion_radius(self):
        kp_xy = jnp.asarray([[10., 10.], [12., 10.], [30., 30.]], jnp.float32)
        score = jnp.asarray([5., 4., 3.], jnp.float32)
        picked = detect.select_zone_balanced(
            kp_xy, score, jnp.ones(3, bool),
            jnp.zeros((1, 2), jnp.float32), jnp.zeros((1,), bool),
            needed=jnp.int32(3), exclusion_radius=jnp.float32(5.0),
            zones_in_a_row=1, image_w=64, image_h=64, max_new=4)
        v = np.asarray(picked.valid)
        uv = {tuple(map(float, p)) for p in np.asarray(picked.uv)[v]}
        assert (10., 10.) in uv and (30., 30.) in uv
        assert (12., 10.) not in uv     # suppressed by exclusion radius

    def test_respects_needed(self):
        kp_xy = jnp.asarray(np.random.default_rng(0)
                            .uniform(0, 64, (20, 2)).astype(np.float32))
        score = jnp.ones(20, jnp.float32)
        picked = detect.select_zone_balanced(
            kp_xy, score, jnp.ones(20, bool),
            jnp.zeros((1, 2), jnp.float32), jnp.zeros((1,), bool),
            needed=jnp.int32(0), exclusion_radius=jnp.float32(1.0),
            zones_in_a_row=2, image_w=64, image_h=64, max_new=8)
        assert not np.asarray(picked.valid).any()
