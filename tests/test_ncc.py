"""NCC active-search matcher tests (vision/ncc.py): patch recovery under
known translation, gating, correlation threshold, and the full engine in
matcher="ncc" mode."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.config import DescriptorConfig, SlamConfig
from openekfmonoslam_tpu.vision import brief, ncc


def textured(rng, h=128, w=128):
    img = rng.integers(0, 255, (h // 4, w // 4)).astype(np.float32)
    img = np.kron(img, np.ones((4, 4), np.float32))
    return np.asarray(brief.smooth(jnp.asarray(img), 1.5))


class TestNccMatch:
    def make_inputs(self, img, true_xy, pred_xy, pr=7):
        """One landmark whose patch was stored at true_xy, predicted at
        pred_xy with a loose isotropic S."""
        patches = ncc.extract_patches(
            jnp.asarray(img),
            jnp.asarray([[true_xy[1], true_xy[0]]], jnp.int32), pr)
        pred_uv = jnp.asarray([pred_xy], jnp.float32)
        S = jnp.asarray([np.eye(2, dtype=np.float32) * 9.0])
        visible = jnp.asarray([True])
        return pred_uv, S, visible, patches

    def test_recovers_true_position(self, rng):
        img = textured(rng)
        # true feature at (64, 60); prediction off by (3, -2)
        pred_uv, S, vis, patches = self.make_inputs(img, (64, 60), (67, 58))
        m = ncc.ncc_match(jnp.asarray(img), pred_uv, S, vis, patches,
                          gate=24.0, patch_radius=7, search_radius=8,
                          min_corr=0.8)
        assert bool(m.matched[0])
        assert abs(float(m.z[0, 0]) - 64) <= 1
        assert abs(float(m.z[0, 1]) - 60) <= 1

    def test_rejects_when_patch_absent(self, rng):
        img = textured(rng)
        other = textured(np.random.default_rng(999))
        patches = ncc.extract_patches(
            jnp.asarray(other), jnp.asarray([[64, 64]], jnp.int32), 7)
        pred_uv = jnp.asarray([[64.0, 64.0]], jnp.float32)
        S = jnp.asarray([np.eye(2, dtype=np.float32) * 9.0])
        m = ncc.ncc_match(jnp.asarray(img), pred_uv, S,
                          jnp.asarray([True]), patches,
                          gate=24.0, patch_radius=7, search_radius=8,
                          min_corr=0.9)
        assert not bool(m.matched[0])

    def test_gate_excludes_far_candidates(self, rng):
        """True position outside the Mahalanobis gate -> no match."""
        img = textured(rng)
        # prediction 12 px away with tight S (sd = 1 px): gate excludes it
        pred_uv, S, vis, patches = self.make_inputs(img, (64, 60), (76, 60))
        S = jnp.asarray([np.eye(2, dtype=np.float32)])
        m = ncc.ncc_match(jnp.asarray(img), pred_uv, S, vis, patches,
                          gate=6.0, patch_radius=7, search_radius=16,
                          min_corr=0.8)
        assert not bool(m.matched[0])

    def test_invisible_never_matches(self, rng):
        img = textured(rng)
        pred_uv, S, vis, patches = self.make_inputs(img, (64, 60), (64, 60))
        m = ncc.ncc_match(jnp.asarray(img), pred_uv, S,
                          jnp.asarray([False]), patches,
                          gate=24.0, patch_radius=7, search_radius=8)
        assert not bool(m.matched[0])


class TestEngineNcc:
    def test_engine_tracks_with_ncc(self, rng):
        from openekfmonoslam_tpu.engine.step import SlamRuntime

        cfg = SlamConfig(
            max_features=16, max_keypoints=96, max_hypotheses=16,
            matcher="ncc",
            descriptor=DescriptorConfig(kind="PATCH", patch_radius=5),
            ncc_search_radius=6, ncc_min_corr=0.6,
            ekf=dataclasses.replace(
                SlamConfig().ekf, min_matches_per_image=10),
        )
        rt = SlamRuntime(cfg)
        big = np.kron(rng.integers(0, 255, (40, 44)),
                      np.ones((4, 4))).astype(np.float32)
        big = np.asarray(brief.smooth(jnp.asarray(big), 1.0))

        def frame(sx):
            return jnp.asarray(big[20:140, 20 + sx:148 + sx])

        state = rt.make_initial_state()
        state = rt.init_step(state, frame(0))
        assert int(state.active.sum()) > 0
        for i in range(1, 4):
            state, rec = rt.step(state, frame(i))
            assert np.isfinite(np.asarray(state.x)).all()
        assert int(rec.total_matches) > 0

    def test_ncc_requires_patch_descriptors(self):
        from openekfmonoslam_tpu.engine.step import SlamRuntime
        import pytest
        cfg = SlamConfig(matcher="ncc")  # BRIEF descriptors
        with pytest.raises(ValueError, match="PATCH"):
            SlamRuntime(cfg)


class TestBilinearPatches:
    def test_integer_positions_match_integer_path(self):
        from openekfmonoslam_tpu.vision.ncc import (extract_patches,
                                                    extract_patches_bilinear)
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
        yx_i = np.array([[20, 20], [30, 41], [10, 50]], np.int32)
        a = np.asarray(extract_patches(img, jnp.asarray(yx_i), 4))
        b = np.asarray(extract_patches_bilinear(
            img, jnp.asarray(yx_i, jnp.float32), 4))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_subpixel_interpolates_linear_ramp(self):
        from openekfmonoslam_tpu.vision.ncc import extract_patches_bilinear
        # on a plane f(y, x) = 2y + 3x the bilinear sample is exact, so a
        # half-pixel shifted patch is the integer patch plus the gradient
        y, x = np.mgrid[0:64, 0:64]
        img = jnp.asarray((2.0 * y + 3.0 * x).astype(np.float32))
        p0 = extract_patches_bilinear(
            img, jnp.asarray([[20.0, 20.0]]), 3)
        p1 = extract_patches_bilinear(
            img, jnp.asarray([[20.5, 20.25]]), 3)
        # zero-mean unit-norm patches of a plane are identical regardless
        # of the constant offset the shift adds
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   atol=1e-5)


class TestWarpTemplates:
    def test_zoom_warp_reconstructs_scaled_appearance(self):
        """Camera translating toward a fronto-parallel textured plane: the
        homography-warped stored template must match the current (zoomed)
        appearance, where the unwarped template decorrelates."""
        from openekfmonoslam_tpu.vision import ncc

        rng = np.random.default_rng(0)
        H, W = 240, 320
        fx = fy = 200.0
        cx, cy = 160.0, 120.0
        pr = 6
        tex = rng.normal(size=(61, 61)).astype(np.float32)
        d0 = 2.0

        def render(cam_z):
            ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
            Z = d0 - cam_z
            px = (xs - cx) / fx * Z
            py = (ys - cy) / fy * Z
            tx = np.clip(px * fx / d0 + 30, 0, 59.999)
            ty = np.clip(py * fy / d0 + 30, 0, 59.999)
            x0, y0 = tx.astype(int), ty.astype(int)
            ax, ay = tx - x0, ty - y0
            return (tex[y0, x0] * (1 - ay) * (1 - ax)
                    + tex[y0, np.minimum(x0 + 1, 60)] * (1 - ay) * ax
                    + tex[np.minimum(y0 + 1, 60), x0] * ay * (1 - ax)
                    + tex[np.minimum(y0 + 1, 60),
                          np.minimum(x0 + 1, 60)] * ay * ax
                    ).astype(np.float32)

        img0, img1 = render(0.0), render(0.4)   # depth 2.0 -> 1.6 (1.25x)
        feats = jnp.zeros((1, 6)).at[0, 0:3].set(
            jnp.asarray([0.0, 0.0, d0]))
        patch0 = ncc.extract_patches(jnp.asarray(img0),
                                     jnp.asarray([[120, 160]]), pr)
        pose0 = jnp.asarray([[0, 0, 0, 1, 0, 0, 0]], jnp.float32)
        cam7 = jnp.asarray([0, 0, 0.4, 1, 0, 0, 0], jnp.float32)
        warped = ncc.warp_templates(
            patch0, pose0, feats, jnp.ones((1,), bool), cam7,
            jnp.asarray([[160.0, 120.0]]), jnp.ones((1,), bool),
            fx, fy, cx, cy, pr)
        true1 = ncc.extract_patches(jnp.asarray(img1),
                                    jnp.asarray([[120, 160]]), pr)
        c_raw = float(jnp.sum(patch0[0] * true1[0]))
        c_warp = float(jnp.sum(warped[0] * true1[0]))
        assert c_warp > 0.98, c_warp
        assert c_warp > c_raw + 0.5, (c_warp, c_raw)

    def test_invalid_pose_falls_back_to_stored(self):
        from openekfmonoslam_tpu.vision import ncc

        rng = np.random.default_rng(1)
        pr = 4
        ps = 2 * pr + 1
        patches = jnp.asarray(rng.normal(size=(3, ps * ps)).astype(
            np.float32))
        pose = jnp.zeros((3, 7), jnp.float32)      # q == 0: no template
        feats = jnp.zeros((3, 6)).at[:, 2].set(2.0)
        out = ncc.warp_templates(
            patches, pose, feats, jnp.ones((3,), bool),
            jnp.asarray([0, 0, 0.3, 1, 0, 0, 0], jnp.float32),
            jnp.full((3, 2), 100.0), jnp.ones((3,), bool),
            200.0, 200.0, 160.0, 120.0, pr)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(patches))
