"""ops/update_kernel.py + ops/predict_kernel.py: the fused phase kernels.

The CI suite runs on CPU where update()/predict() fall back to the XLA
chain (every engine test covers that path); the kernels themselves need
a TPU and were validated there against the XLA chain AND a float64
NumPy oracle (update: x/P within ~4e-6 absolute of f64 on a
conditioning-realistic problem, tighter than the 3-pass XLA chain
itself; predict: x bit-identical, P within f32 roundoff) -- re-run
these when a TPU is attached.  The golden trajectory and the TPU bench
drive them end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.filter import predict as pred_mod
from openekfmonoslam_tpu.filter import update as upd_mod
from openekfmonoslam_tpu.filter.measure import Prediction
from openekfmonoslam_tpu.filter.state import SlamState

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas kernels need a TPU (CPU CI covers the XLA fallback)")

N, F = 640, 96


def _state(rng):
    P0 = rng.standard_normal((N, 80)).astype(np.float32)
    P = (P0 @ P0.T / 80 + 0.5 * np.eye(N)).astype(np.float32)
    x = rng.standard_normal(N).astype(np.float32) * 0.1
    q = rng.standard_normal(4)
    x[3:7] = q / np.linalg.norm(q)
    return SlamState(
        x=jnp.asarray(x), P=jnp.asarray(P),
        active=jnp.ones(F, bool), is_xyz=jnp.zeros(F, bool),
        times_predicted=jnp.zeros(F, jnp.int32),
        times_matched=jnp.zeros(F, jnp.int32),
        descriptors=jnp.zeros((F, 32), jnp.uint8),
        patch_pose=jnp.zeros((F, 7), jnp.float32),
        birth=jnp.zeros(F, jnp.int32),
        rng=jax.random.PRNGKey(0), frame=jnp.int32(0))


def _update_problem(rng, use_frac=0.6):
    state = _state(rng)
    # bounded-conditioning S like the real update's (H P H^T has the
    # r_diag floor; huge-cond synthetic S exercises the rescue loop
    # instead of the happy path)
    H = (rng.standard_normal((2 * F, N)) * 0.05).astype(np.float32)
    HP = H @ np.asarray(state.P)
    Sfull = HP @ H.T
    uv = rng.uniform(0, 600, (F, 2)).astype(np.float32)
    z = (uv + rng.standard_normal((F, 2))).astype(np.float32)
    use = rng.uniform(size=F) < use_frac
    pred = Prediction(
        uv=jnp.asarray(uv), visible=jnp.asarray(use),
        Hc=jnp.zeros((F, 2, 13), jnp.float32),
        Hf=jnp.zeros((F, 2, 6), jnp.float32),
        S=jnp.zeros((F, 2, 2), jnp.float32),
        HP=jnp.asarray(HP), Sfull=jnp.asarray(Sfull))
    return state, pred, jnp.asarray(z), jnp.asarray(use)


@pytest.mark.parametrize("use_frac", [0.6, 0.0])
def test_update_kernel_matches_xla_chain(use_frac):
    state, pred, z, use = _update_problem(np.random.default_rng(0),
                                          use_frac)
    pe = 1.0
    with jax.default_matmul_precision("high"):
        ref = jax.jit(lambda s: upd_mod.update(s, pred, z, use, pe))(state)
        got = jax.jit(lambda s: upd_mod.update(s, pred, z, use, pe,
                                               use_kernel=True))(state)
    if use_frac == 0.0:
        # no applied match: exact pass-through on both paths
        np.testing.assert_array_equal(np.asarray(ref.x), np.asarray(got.x))
        np.testing.assert_array_equal(np.asarray(ref.P), np.asarray(got.P))
        np.testing.assert_array_equal(np.asarray(got.x),
                                      np.asarray(state.x))
        return
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P),
                               rtol=0, atol=5e-4)
    # kernel output stays symmetric (finalize's symmetrize is folded in)
    Pg = np.asarray(got.P)
    np.testing.assert_allclose(Pg, Pg.T, rtol=0, atol=1e-5)


def test_update_kernel_f64_oracle():
    state, pred, z, use = _update_problem(np.random.default_rng(3))
    pe = 1.0
    with jax.default_matmul_precision("high"):
        got = jax.jit(lambda s: upd_mod.update(s, pred, z, use, pe,
                                               use_kernel=True))(state)
    u2 = np.repeat(np.asarray(use), 2).astype(np.float64)
    HPm = np.asarray(pred.HP, np.float64) * u2[:, None]
    Sm = (np.asarray(pred.Sfull, np.float64) * np.outer(u2, u2)
          + np.diag(np.where(u2 > 0, pe, 1.0)))
    res = ((np.asarray(z) - np.asarray(pred.uv))
           * np.asarray(use)[:, None]).reshape(-1).astype(np.float64)
    KT = np.linalg.inv(Sm) @ HPm
    x64 = np.asarray(state.x, np.float64) + KT.T @ res
    P64 = np.asarray(state.P, np.float64) - KT.T @ HPm
    P64 = 0.5 * (P64 + P64.T)
    q = x64[3:7]
    n2 = q @ q
    w, x_, y, z_ = q
    J = n2 ** -1.5 * np.array(
        [[x_ * x_ + y * y + z_ * z_, -w * x_, -w * y, -w * z_],
         [-x_ * w, w * w + y * y + z_ * z_, -x_ * y, -x_ * z_],
         [-y * w, -y * x_, w * w + x_ * x_ + z_ * z_, -y * z_],
         [-z_ * w, -z_ * x_, -z_ * y, w * w + x_ * x_ + y * y]])
    P64[3:7, :] = J @ P64[3:7, :]
    P64[:, 3:7] = P64[:, 3:7] @ J.T
    x64[3:7] = q / np.sqrt(n2)
    np.testing.assert_allclose(np.asarray(got.x, np.float64), x64,
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.P, np.float64), P64,
                               rtol=0, atol=5e-4)


def test_predict_kernel_matches_xla_chain():
    cfg = SlamConfig()
    state = _state(np.random.default_rng(1))
    with jax.default_matmul_precision("high"):
        ref = jax.jit(lambda s: pred_mod.predict(s, cfg))(state)
        got = jax.jit(lambda s: pred_mod.predict(s, cfg,
                                                 use_kernel=True))(state)
    # x propagation is scalar math on both paths: bit-identical
    np.testing.assert_array_equal(np.asarray(ref.x), np.asarray(got.x))
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P),
                               rtol=0, atol=1e-4)
    # untouched region of the aliased P (rows/cols >= 13) passes through
    # bit-exactly
    np.testing.assert_array_equal(np.asarray(got.P)[13:, 13:],
                                  np.asarray(state.P)[13:, 13:])


def test_init_kernel_matches_jacfwd():
    from openekfmonoslam_tpu.core.camera import Camera
    from openekfmonoslam_tpu.filter.features import init_feature
    from openekfmonoslam_tpu.ops.init_kernel import init_chain_pallas

    cfg = SlamConfig()
    cam = Camera.from_calibration(cfg.camera, jnp.float32)
    rng = np.random.default_rng(0)
    C = 96
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    cam7 = jnp.asarray(np.concatenate([rng.normal(0, 0.1, 3), q]),
                       jnp.float32)
    uv = jnp.asarray(rng.uniform(20, 600, (C, 2)), jnp.float32)
    rho0 = 1.0

    def feat_and_jacs(uvi):
        uv_rho = jnp.concatenate([uvi, jnp.float32(rho0)[None]])
        f = init_feature(cam, cam7, uv_rho)
        J1 = jax.jacfwd(lambda c: init_feature(cam, c, uv_rho))(cam7)
        J2 = jax.jacfwd(lambda m: init_feature(cam, cam7, m))(uv_rho)
        return f, J1, J2

    f_r, J1_r, J2_r = jax.jit(jax.vmap(feat_and_jacs))(uv)
    f_k, J1_k, J2_k = jax.jit(
        lambda u: init_chain_pallas(cam, cam7, u, rho0))(uv)
    np.testing.assert_array_equal(np.asarray(f_r), np.asarray(f_k))
    # the f32 jacfwd chain itself carries ~6e-3 jvp cancellation error
    # (measured vs a float64 jacfwd the kernel matches to 5e-7), so the
    # cross-check tolerance is jacfwd's own noise floor
    np.testing.assert_allclose(np.asarray(J1_k), np.asarray(J1_r),
                               rtol=0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(J2_k), np.asarray(J2_r),
                               rtol=0, atol=1e-4)
