"""Filter math validation: predict/measure/update/add/convert vs finite
differences and brute-force dense NumPy equivalents of the reference
algorithms (StateAndCovariancePrediction.cpp, MeasurementPrediction.cpp,
Update.cpp, AddMapFeature.cpp, MapManagement.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter import features as feat_mod
from openekfmonoslam_tpu.filter import mapman
from openekfmonoslam_tpu.filter import measure as meas_mod
from openekfmonoslam_tpu.filter import predict as pred_mod
from openekfmonoslam_tpu.filter import update as upd_mod
from openekfmonoslam_tpu.filter.state import (
    CAM_DIM,
    SlamState,
    dim_active_mask,
    make_initial_state,
)


@pytest.fixture(scope="module")
def cfg():
    return SlamConfig(max_features=6, dtype="float64")


@pytest.fixture(scope="module")
def camera(cfg):
    return Camera.from_calibration(cfg.camera, dtype=jnp.float64)


def make_populated_state(cfg, camera, rng, n_active=4, n_xyz=1):
    """A state with some landmarks spread in front of the camera and a
    plausible SPD covariance."""
    state = make_initial_state(cfg, dtype=jnp.float64)
    # camera at origin with small motion
    x = np.asarray(state.x).copy()
    x[7:10] = [0.002, -0.001, 0.003]       # v
    x[10:13] = [0.001, 0.002, -0.001]      # w

    active = np.zeros(cfg.max_features, bool)
    is_xyz = np.zeros(cfg.max_features, bool)
    for i in range(n_active):
        off = CAM_DIM + 6 * i
        active[i] = True
        if i < n_xyz:
            is_xyz[i] = True
            # an XYZ landmark in front of the camera
            x[off:off + 3] = [0.3 * (i - 1), 0.2, 2.0 + i]
        else:
            # inverse-depth: anchor at origin, bearing near +z
            theta = 0.1 * (i - 1)
            phi = 0.05 * i
            x[off:off + 6] = [0.01 * i, -0.01, 0.0, theta, phi, 0.8]

    # SPD covariance over the active dims
    dim_mask = np.concatenate([
        np.ones(CAM_DIM, bool),
        np.concatenate([
            (np.arange(6) < 3) if is_xyz[i] else np.ones(6, bool)
            if active[i] else np.zeros(6, bool)
            for i in range(cfg.max_features)
        ]),
        np.zeros(cfg.padded_state_dim - cfg.state_dim, bool),
    ])
    n = cfg.padded_state_dim
    A = rng.normal(size=(n, n)) * 0.01
    P = A @ A.T + 0.1 * np.eye(n)
    P = P * np.outer(dim_mask, dim_mask)

    return state._replace(
        x=jnp.asarray(x),
        P=jnp.asarray(P),
        active=jnp.asarray(active),
        is_xyz=jnp.asarray(is_xyz),
    ), dim_mask


class TestPredict:
    def test_motion_model_semantics(self, cfg):
        cam = jnp.asarray(
            [1., 2., 3., 1., 0., 0., 0., .1, .2, .3, 0., 0., 0.])
        out = np.asarray(pred_mod.motion_model(cam, 1.0))
        np.testing.assert_allclose(out[0:3], [1.1, 2.2, 3.3], atol=1e-12)
        np.testing.assert_allclose(out[3:7], [1, 0, 0, 0], atol=1e-12)
        np.testing.assert_allclose(out[7:], np.asarray(cam)[7:], atol=1e-15)

    def test_F_matches_finite_differences(self, rng):
        cam = jnp.asarray(np.concatenate([
            rng.normal(size=3),
            [1.0, 0.01, -0.02, 0.005],
            rng.normal(size=3) * 0.1,
            rng.normal(size=3) * 0.05,
        ]))
        F = np.asarray(jax.jacfwd(
            lambda c: pred_mod.motion_model(c, 1.0))(cam))
        eps = 1e-7
        for j in range(13):
            dc = np.zeros(13)
            dc[j] = eps
            fp = np.asarray(pred_mod.motion_model(cam + dc, 1.0))
            fm = np.asarray(pred_mod.motion_model(cam - dc, 1.0))
            np.testing.assert_allclose(F[:, j], (fp - fm) / (2 * eps),
                                       atol=1e-6)

    def test_covariance_propagation_structure(self, cfg, camera, rng):
        state, dim_mask = make_populated_state(cfg, camera, rng)
        new = pred_mod.predict(state, cfg)
        P = np.asarray(new.P)
        # feature-feature blocks untouched
        np.testing.assert_allclose(P[CAM_DIM:, CAM_DIM:],
                                   np.asarray(state.P)[CAM_DIM:, CAM_DIM:])
        # symmetric camera block; PSD preserved on active dims
        np.testing.assert_allclose(P[:13, :13], P[:13, :13].T, atol=1e-12)
        act = dim_mask
        eig = np.linalg.eigvalsh(P[np.ix_(act, act)])
        assert eig.min() > 0
        # cross strip = F @ old cross strip
        F = np.asarray(jax.jacfwd(
            lambda c: pred_mod.motion_model(c, 1.0))(state.x[:13]))
        np.testing.assert_allclose(
            P[:13, 13:], F @ np.asarray(state.P)[:13, 13:], atol=1e-12)
        # inactive dims remain zero
        assert np.all(P[~act, :] == 0) and np.all(P[:, ~act] == 0)


class TestMeasure:
    def test_h_jacobians_match_finite_differences(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng)
        pred = meas_mod.predict_measurements(state, camera)
        vis = np.asarray(pred.visible)
        assert vis.sum() >= 3, "test fixture should have visible features"

        x = np.asarray(state.x)
        eps = 1e-7
        for i in np.nonzero(vis)[0]:
            feat = np.asarray(state.features)[i]
            is_xyz = bool(np.asarray(state.is_xyz)[i])

            def h(cam7, f):
                return np.asarray(meas_mod.measure_one(
                    camera, jnp.asarray(cam7), jnp.asarray(f),
                    jnp.asarray(is_xyz)))

            # d/d cam pose
            Hc = np.asarray(pred.Hc)[i]
            for j in range(7):
                d = np.zeros(7)
                d[j] = eps
                fd = (h(x[:7] + d, feat) - h(x[:7] - d, feat)) / (2 * eps)
                np.testing.assert_allclose(Hc[:, j], fd, atol=1e-4)
            assert np.all(Hc[:, 7:] == 0)
            # d/d feature
            Hf = np.asarray(pred.Hf)[i]
            ndim = 3 if is_xyz else 6
            for j in range(ndim):
                d = np.zeros(6)
                d[j] = eps
                fd = (h(x[:7], feat + d) - h(x[:7], feat - d)) / (2 * eps)
                np.testing.assert_allclose(Hf[:, j], fd, atol=1e-4)

    def test_S_equals_dense_computation(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng)
        pred = meas_mod.predict_measurements(state, camera)
        H = np.asarray(meas_mod.dense_H(pred.Hc, pred.Hf, cfg.padded_state_dim))
        P = np.asarray(state.P)
        S_dense = (H @ P @ H.T).reshape(cfg.max_features, 2,
                                        cfg.max_features, 2)
        for i in np.nonzero(np.asarray(pred.visible))[0]:
            want = S_dense[i, :, i, :] + np.eye(2)
            np.testing.assert_allclose(np.asarray(pred.S)[i], want,
                                       atol=1e-10)

    def test_invisible_masked(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng)
        pred = meas_mod.predict_measurements(state, camera)
        inv = ~np.asarray(pred.visible)
        assert np.all(np.asarray(pred.Hc)[inv] == 0)
        assert np.all(np.asarray(pred.Hf)[inv] == 0)
        assert np.all(np.isfinite(np.asarray(pred.uv)))


class TestUpdate:
    def test_masked_update_equals_compacted(self, cfg, camera, rng):
        """The masked dense update must equal the update done on compacted
        (active-only) matrices -- the key slot-model equivalence."""
        state, dim_mask = make_populated_state(cfg, camera, rng)
        pred = meas_mod.predict_measurements(state, camera)
        vis = np.asarray(pred.visible)
        use = vis.copy()
        use[np.nonzero(vis)[0][-1]] = False    # drop one match
        z = np.asarray(pred.uv) + rng.normal(size=(cfg.max_features, 2)) * 0.5
        z[~use] = 0.0

        new = upd_mod.kalman_update(
            state, pred, jnp.asarray(z), jnp.asarray(use), 1.0)

        # --- NumPy compacted equivalent (determineKalmanGain Update.cpp:92,
        # stateUpdate :116, covarianceUpdate :214) ---
        P = np.asarray(state.P)
        H = np.asarray(meas_mod.dense_H(pred.Hc, pred.Hf, cfg.padded_state_dim))
        rows = np.repeat(use, 2)
        act = dim_mask
        Hcomp = H[np.ix_(rows, act)]
        Pcomp = P[np.ix_(act, act)]
        S = Hcomp @ Pcomp @ Hcomp.T + np.eye(rows.sum()) * 1.0
        K = Pcomp @ Hcomp.T @ np.linalg.inv(S)
        res = (z - np.asarray(pred.uv))[use].reshape(-1)
        x_want = np.asarray(state.x).copy()
        x_want[act] += K @ res
        P_want = P.copy()
        P_want[np.ix_(act, act)] = (np.eye(act.sum()) - K @ Hcomp) @ Pcomp

        np.testing.assert_allclose(np.asarray(new.x), x_want, atol=1e-9)
        np.testing.assert_allclose(np.asarray(new.P), P_want, atol=1e-9)

    def test_no_matches_is_identity(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng)
        pred = meas_mod.predict_measurements(state, camera)
        use = jnp.zeros(cfg.max_features, bool)
        z = jnp.zeros((cfg.max_features, 2), dtype=jnp.float64)
        new = upd_mod.update(state, pred, z, use, 1.0)
        np.testing.assert_allclose(np.asarray(new.x), np.asarray(state.x))
        np.testing.assert_allclose(np.asarray(new.P), np.asarray(state.P))

    def test_finalize_symmetrizes_and_normalizes(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng)
        # perturb q off unit norm
        x = np.asarray(state.x).copy()
        x[3:7] = [1.01, 0.02, -0.01, 0.005]
        st = state._replace(x=jnp.asarray(x))
        new = upd_mod.finalize_update(st, jnp.asarray(True))
        q = np.asarray(new.x)[3:7]
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        P = np.asarray(new.P)
        np.testing.assert_allclose(P, P.T, atol=1e-9)


class TestAddFeature:
    def test_init_feature_geometry(self, cfg, camera):
        """A feature at the principal point looks along the camera z axis."""
        cam7 = jnp.asarray([0., 0., 0., 1., 0., 0., 0.])
        uv_rho = jnp.asarray([float(camera.cx), float(camera.cy), 1.0])
        f = np.asarray(feat_mod.init_feature(camera, cam7, uv_rho))
        np.testing.assert_allclose(f[0:3], 0, atol=1e-12)
        np.testing.assert_allclose(f[3], 0, atol=1e-9)   # theta
        np.testing.assert_allclose(f[4], 0, atol=1e-9)   # phi
        assert f[5] == 1.0

    def test_add_grows_covariance_like_reference(self, cfg, camera, rng):
        """Adding into an empty slot equals the reference's explicit
        block construction (addFeatureToCovarianceMatrix,
        AddMapFeature.cpp:221-289)."""
        state, dim_mask = make_populated_state(cfg, camera, rng, n_active=2,
                                               n_xyz=0)
        uv = jnp.asarray([[350.0, 250.0]])
        desc = jnp.zeros((1, 8), dtype=jnp.uint32)
        valid = jnp.asarray([True])
        new = feat_mod.add_features(state, camera, cfg, uv, desc, valid)

        slot = 2   # first free slot
        assert bool(np.asarray(new.active)[slot])
        off = CAM_DIM + 6 * slot

        cam7 = np.asarray(state.x)[:7]
        uv_rho = np.asarray([350.0, 250.0, cfg.ekf.init_inv_depth_rho])
        J1 = np.asarray(jax.jacfwd(
            lambda c: feat_mod.init_feature(camera, c, jnp.asarray(uv_rho)))(
                jnp.asarray(cam7)))
        J2 = np.asarray(jax.jacfwd(
            lambda m: feat_mod.init_feature(camera, jnp.asarray(cam7), m))(
                jnp.asarray(uv_rho)))
        P = np.asarray(state.P)
        R = np.diag([cfg.camera.pixel_error_x ** 2,
                     cfg.camera.pixel_error_y ** 2,
                     cfg.ekf.inverse_depth_rho_sd ** 2])
        cross = J1 @ P[:7, :]
        block = cross[:, :7] @ J1.T + J2 @ R @ J2.T

        Pn = np.asarray(new.P)
        np.testing.assert_allclose(Pn[off:off + 6, :off], cross[:, :off],
                                   atol=1e-12)
        np.testing.assert_allclose(Pn[:off, off:off + 6], cross[:, :off].T,
                                   atol=1e-12)
        np.testing.assert_allclose(Pn[off:off + 6, off:off + 6], block,
                                   atol=1e-12)

    def test_add_respects_capacity(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng, n_active=6)
        # all slots taken: nothing may be written
        uv = jnp.asarray([[300.0, 200.0]])
        desc = jnp.zeros((1, 8), dtype=jnp.uint32)
        new = feat_mod.add_features(state, camera, cfg, uv, desc,
                                    jnp.asarray([True]))
        np.testing.assert_allclose(np.asarray(new.P), np.asarray(state.P))


class TestMapManagement:
    def test_remove_features_zeroes(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng)
        remove = np.zeros(cfg.max_features, bool)
        remove[1] = True
        new = mapman.remove_features(state, jnp.asarray(remove))
        off = CAM_DIM + 6 * 1
        assert not bool(np.asarray(new.active)[1])
        assert np.all(np.asarray(new.P)[off:off + 6, :] == 0)
        assert np.all(np.asarray(new.P)[:, off:off + 6] == 0)
        assert np.all(np.asarray(new.x)[off:off + 6] == 0)

    def test_bad_feature_mask(self, cfg, camera, rng):
        state, _ = make_populated_state(cfg, camera, rng)
        tp = np.zeros(cfg.max_features, np.int32)
        tm = np.zeros(cfg.max_features, np.int32)
        tp[1], tm[1] = 10, 2     # ratio 0.2 < 0.5 -> bad
        tp[2], tm[2] = 10, 8     # ratio 0.8 -> good
        st = state._replace(times_predicted=jnp.asarray(tp),
                            times_matched=jnp.asarray(tm))
        bad = np.asarray(mapman.bad_feature_mask(st, 0.5))
        assert bad[1] and not bad[2]
        assert not bad[0]        # never predicted -> kept (NaN semantics)

    def test_convert_to_xyz_jacobian(self, cfg, camera, rng):
        state, dim_mask = make_populated_state(cfg, camera, rng, n_active=4,
                                               n_xyz=0)
        # force slot 1 to be converted: shrink its rho variance
        P = np.asarray(state.P).copy()
        rho_dim = CAM_DIM + 6 * 1 + 5
        P[rho_dim, :] *= 1e-8
        P[:, rho_dim] *= 1e-8
        st = state._replace(P=jnp.asarray(P))
        li = np.asarray(mapman.linearity_index(st))
        assert li[1] < 0.1

        new = mapman.convert_one_to_xyz(st, 0.1)
        assert bool(np.asarray(new.is_xyz)[1])

        # xyz value = anchor + m/rho (changeInverseDepthToDepth,
        # CommonFunctions.cpp:149-159)
        f = np.asarray(st.features)[1]
        from openekfmonoslam_tpu.core import quaternion as quat
        m = np.asarray(quat.directional_vector(jnp.asarray(f[3]),
                                               jnp.asarray(f[4])))
        off = CAM_DIM + 6 * 1
        np.testing.assert_allclose(np.asarray(new.x)[off:off + 3],
                                   f[0:3] + m / f[5], atol=1e-12)
        # retired dims zeroed
        assert np.all(np.asarray(new.P)[off + 3:off + 6, :] == 0)
        # new block = J P66 J^T
        eps = 1e-7
        Jfd = np.zeros((3, 6))
        for j in range(6):
            d = np.zeros(6)
            d[j] = eps

            def xyz_of(fv):
                mv = np.asarray(quat.directional_vector(
                    jnp.asarray(fv[3]), jnp.asarray(fv[4])))
                return fv[0:3] + mv / fv[5]

            Jfd[:, j] = (xyz_of(f + d) - xyz_of(f - d)) / (2 * eps)
        P66 = np.asarray(st.P)[off:off + 6, off:off + 6]
        np.testing.assert_allclose(
            np.asarray(new.P)[off:off + 3, off:off + 3],
            Jfd @ P66 @ Jfd.T, rtol=1e-5, atol=1e-10)

    def test_dim_active_mask(self, cfg, camera, rng):
        state, dim_mask = make_populated_state(cfg, camera, rng)
        got = np.asarray(dim_active_mask(state))
        np.testing.assert_array_equal(got, dim_mask)


def test_motion_jacobian_matches_jacfwd(rng):
    """The analytic F (closed-form quaternion product Jacobians) must be
    the same matrix jax.jacfwd extracts from the motion model, including
    the small-angle limits (the reference seeds w = EPSILON,
    CommonFunctions.cpp:52-54)."""
    import jax

    from openekfmonoslam_tpu.filter.predict import (motion_jacobian,
                                                    motion_model)

    for trial in range(20):
        cam = rng.normal(0, 1, 13)
        cam[3:7] /= np.linalg.norm(cam[3:7])
        if trial < 5:
            cam[10:13] = rng.normal(0, 1e-9, 3)
        elif trial < 10:
            cam[10:13] = np.full(3, 2.22e-16)
        c = jnp.asarray(cam)
        Fj = jax.jacfwd(lambda x: motion_model(x, 1.0))(c)
        Fa = motion_jacobian(c, 1.0)
        np.testing.assert_allclose(np.asarray(Fa), np.asarray(Fj),
                                   rtol=0, atol=1e-12)
