"""Automatic loop closure on real frames (VERDICT round 1 missing #5).

A spliced s3 sequence -- forward, a blackout (tracking loss + velocity
coasting + relocalization), then the same frames reversed back to the
start -- has ground-truth endpoint == start.  The blackout injects real
drift; place recognition on the final keyframes must close the loop
against the early keyframes and the graph-corrected trajectory must end
measurably closer to the start than the raw filter trajectory.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.graph.loop_closure import pnp_gauss_newton
from openekfmonoslam_tpu.config import CameraCalibration

FRAMES_DIR = "/root/reference/experiments/s3/costado_recto1"
CONFIG = "/root/reference/experiments/s3/config.yml"


def test_pnp_recovers_pose(rng):
    """GN PnP recovers a known camera pose from exact projections."""
    import jax
    from openekfmonoslam_tpu.core import camera as cam_mod
    from openekfmonoslam_tpu.core import quaternion as quat

    cam = Camera.from_calibration(CameraCalibration(), jnp.float64)
    r_true = jnp.asarray([0.12, -0.05, 0.08], jnp.float64)
    q_true = jnp.asarray([0.99, 0.05, -0.08, 0.03], jnp.float64)
    q_true = q_true / jnp.linalg.norm(q_true)
    xyz = jnp.asarray(rng.uniform([-0.8, -0.6, 1.2], [0.8, 0.6, 3.0],
                                  size=(24, 3)))
    Rt = quat.to_rotation_matrix(q_true).T
    uv = jax.vmap(lambda X: cam_mod.distort(
        cam, cam_mod.project(cam, Rt @ (X - r_true))))(xyz)

    r0 = r_true + jnp.asarray([0.05, -0.04, 0.06])
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float64)
    r, q, rms, n, H = pnp_gauss_newton(
        cam, xyz, uv, jnp.ones((24,), bool), r0, q0)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_true), atol=1e-8)
    assert float(rms) < 1e-6
    assert int(n) == 24
    # information is SPD and strong (24 points, fx ~ 525)
    assert np.linalg.eigvalsh(np.asarray(H)).min() > 0


@pytest.mark.skipif(not os.path.isdir(FRAMES_DIR),
                    reason="bundled s3 dataset not present")
def test_loop_closure_reduces_endpoint_drift():
    from openekfmonoslam_tpu.engine.engine import SlamEngine
    from openekfmonoslam_tpu.io.sources import FileSequenceSource

    fwd = list(FileSequenceSource(FRAMES_DIR, begin=1, end=46))
    black = [np.zeros_like(fwd[0])] * 8
    seq = fwd + black + fwd[::-1][1:]

    eng = SlamEngine(CONFIG, keyframe_every=6, relocalize_after=3)
    eng.init(seq[0])
    for f in seq[1:]:
        eng.step(f)

    assert eng.relocalizations >= 1, "blackout did not trigger relocalization"
    assert eng.loop_closer.closures, "no loop closure detected"

    raw = np.asarray([r["position"] for r in eng.records])
    corrected = eng.corrected_trajectory()

    # ground truth: the reversed sequence ends where it started
    start = raw[0]
    raw_err = np.linalg.norm(raw[-1] - start)
    corr_err = np.linalg.norm(corrected[-1] - corrected[0])
    path = np.sum(np.linalg.norm(np.diff(raw, axis=0), axis=1))
    print(f"endpoint error: raw {raw_err:.4f} -> corrected {corr_err:.4f} "
          f"(path {path:.3f}, {len(eng.loop_closer.closures)} closures, "
          f"{eng.relocalizations} relocalizations)")
    assert corr_err < 0.8 * raw_err, (corr_err, raw_err)
