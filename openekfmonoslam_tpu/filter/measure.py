"""Measurement prediction: h(x), Jacobians H, and innovation covariances.

Reference: MeasurementPrediction.cpp.  For every map feature the pipeline
computes the predicted distorted pixel (world -> camera frame -> pinhole
projection -> re-distortion, :203-265), a visibility gate (:162-181), the
2-row measurement Jacobian H_i = [dh/d(cam pose) | dh/d(feature)]
(:273-589), and the per-feature innovation covariance
S_i = H_i P H_i^T + I (identity measurement noise on this path, :647-653).

TPU-first departures:
  * every slot is processed at once under ``vmap`` -- the reference's
    per-feature loop (:681-699) disappears;
  * H_i comes from the analytic structure-of-arrays chain in
    filter/measure_fast.py (the correct-math version of the reference's
    ~300-line hand chain rule :273-589, without its transcription bugs,
    e.g. the jacobian[1]/jacobian[2] slip at :371-373) -- with a vmapped
    jax.jacfwd of the exact measurement function kept as the independent
    cross-check implementation (tests/test_measure_fast.py locks the two
    elementwise);
  * visibility is a mask, not a compacted vector; invisible slots carry
    zero Jacobians and S_i = I so downstream masked algebra stays finite.

h depends only on (r, q) of the camera and the slot's own 6 parameters, so
Jacobians are computed w.r.t. a 7+6 vector and scattered into padded form.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.core import camera as cam_mod
from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.core.camera import Camera
from openekfmonoslam_tpu.filter.state import CAM_DIM, FEAT_DIM, SlamState


class Prediction(NamedTuple):
    """Per-slot measurement predictions (all shapes lead with F slots)."""

    uv: jnp.ndarray        # (F, 2) predicted distorted pixel
    visible: jnp.ndarray   # (F,) bool: active & in front & in image
    Hc: jnp.ndarray        # (F, 2, 13) dh/d(camera state); cols 7:13 zero
    Hf: jnp.ndarray        # (F, 2, 6) dh/d(feature slot params)
    S: jnp.ndarray         # (F, 2, 2) innovation covariance (R_i = I)
    # Shared H P products, assembled ONCE here and reused by the per-slot
    # S_i above, the 1-point RANSAC's P H^T (P is symmetric), and the
    # joint updates (masking rows of H commutes with the product, so the
    # update's masked H P is just a row-masked view) -- one assembly
    # instead of four per frame.
    HP: jnp.ndarray        # (2F, N) = H P with the visibility-masked H
    Sfull: jnp.ndarray     # (2F, 2F) = H P H^T (NO measurement noise)


def point_in_camera_frame(cam7: jnp.ndarray, feat: jnp.ndarray,
                          is_xyz: jnp.ndarray) -> jnp.ndarray:
    """World feature -> camera-frame point.

    Inverse-depth: R(q)^T (rho (anchor - r) + m(theta, phi))
    (changeToCameraReferenceAxisInverseDepth, MeasurementPrediction.cpp:127-140);
    XYZ: R(q)^T (p - r) (:147-156).
    """
    r, q = cam7[0:3], cam7[3:7]
    Rcw = quat.to_rotation_matrix(q).T
    m = quat.directional_vector(feat[3], feat[4])
    p_inv = feat[5] * (feat[0:3] - r) + m
    p_xyz = feat[0:3] - r
    return Rcw @ jnp.where(is_xyz, p_xyz, p_inv)


def measure_one(camera: Camera, cam7: jnp.ndarray, feat: jnp.ndarray,
                is_xyz: jnp.ndarray) -> jnp.ndarray:
    """h: (camera pose, feature) -> predicted distorted pixel (2,).

    The camera-frame z is clamped away from zero so h and its Jacobian stay
    finite for slots that are behind the camera or empty; such slots are
    masked out by the visibility gate anyway.
    """
    p_cam = point_in_camera_frame(cam7, feat, is_xyz)
    z_safe = jnp.where(jnp.abs(p_cam[2]) < 1e-6, 1.0, p_cam[2])
    p_safe = p_cam.at[2].set(z_safe)
    uv = cam_mod.project(camera, p_safe)
    return cam_mod.distort(camera, uv)


def _measure_with_jac(camera, cam7, feat, is_xyz):
    def h(inp):
        return measure_one(camera, inp[:7], inp[7:], is_xyz)

    inp = jnp.concatenate([cam7, feat])
    uv = h(inp)
    J = jax.jacfwd(h)(inp)          # (2, 13)
    return uv, J[:, :7], J[:, 7:]


def predict_measurements(state: SlamState, camera: Camera,
                         analytic: bool = True,
                         quirks: bool = False,
                         hp_layout: str = "blocks",
                         use_kernel: bool = False) -> Prediction:
    """Vectorized h + H + S for every slot (predictCameraMeasurements,
    MeasurementPrediction.cpp:705-719).

    ``analytic`` selects the structure-of-arrays hand-chain Jacobians
    (filter/measure_fast.py) -- the same derivative as the jacfwd path
    below (locked elementwise by tests/test_measure_fast.py) compiled to
    ~10x fewer kernels; False keeps vmapped jacfwd (the independent
    implementation the equivalence test checks against).

    ``quirks`` selects the reference's bug-compatible H chain
    (measure_fast docstring; analytic only -- jacfwd differentiates the
    true h and cannot reproduce transcription bugs).
    """
    if quirks and not analytic:
        raise ValueError("reference_quirks requires the analytic H chain")
    F = state.n_features
    dtype = state.P.dtype
    cam7 = state.x[:7]
    feats = state.features                       # (F, 6)

    if (use_kernel and analytic and dtype == jnp.float32
            and jax.default_backend() == "tpu"):
        # ONE Pallas kernel for the whole chain + visibility (the XLA
        # path compiles to ~60-80 tiny fusions; ops/measure_kernel.py)
        from openekfmonoslam_tpu.ops.measure_kernel import (
            measure_chain_pallas)
        uv, Hc7, Hf, visible = measure_chain_pallas(
            camera, cam7, feats, state.is_xyz, state.active, quirks=quirks)
    elif analytic:
        from openekfmonoslam_tpu.filter import measure_fast
        uv, Hc7, Hf = measure_fast.measurements_with_jacobians(
            camera, cam7, feats, state.is_xyz, quirks=quirks)
        visible = measure_fast.visibility(
            camera, cam7, feats, state.is_xyz, state.active, uv)
    else:
        # --- h and Jacobians, vmapped over slots ---
        uv, Hc7, Hf = jax.vmap(
            lambda f, xyz: _measure_with_jac(camera, cam7, f, xyz)
        )(feats, state.is_xyz)

        # --- visibility gate ---
        p_cam = jax.vmap(
            lambda f, xyz: point_in_camera_frame(cam7, f, xyz)
        )(feats, state.is_xyz)
        visible = (state.active
                   & cam_mod.in_front_and_in_fov(camera, p_cam)
                   & cam_mod.in_image(camera, uv))

    vis = visible[:, None, None].astype(dtype)
    Hc = jnp.concatenate(
        [Hc7 * vis, jnp.zeros((F, 2, CAM_DIM - 7), dtype=dtype)], axis=-1)
    Hf = Hf * vis
    # Retired dims of converted-XYZ slots must carry no Jacobian.
    first3 = (jnp.arange(FEAT_DIM) < 3)
    feat_dim_mask = jnp.where(state.is_xyz[:, None], first3[None, :], True)
    Hf = Hf * feat_dim_mask[:, None, :].astype(dtype)

    # --- shared H P / H P H^T, then per-slot S_i as diagonal blocks ---
    HP, Sfull = hp_products(state.P, Hc, Hf, layout=hp_layout)
    S = diag_blocks_2x2(Sfull) + jnp.eye(2, dtype=dtype)[None, :, :]
    uv = jnp.where(visible[:, None], uv, 0.0)
    return Prediction(uv=uv, visible=visible, Hc=Hc, Hf=Hf, S=S,
                      HP=HP, Sfull=Sfull)


def hp_products(P: jnp.ndarray, Hc: jnp.ndarray, Hf: jnp.ndarray,
                layout: str = "blocks") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H P (2F, N), H P H^T (2F, 2F)) from the block-sparse H.

    This is the ONE H P assembly per measurement prediction that the
    per-slot innovation S_i (makeMeasurementCovariance,
    MeasurementPrediction.cpp:595-658), the RANSAC P H^T, and the joint
    update all share.  Two mathematically-identical layouts:

    ``blocks`` (single-chip default): H's row block i is
    [Hc_i | 0 .. Hf_i .. 0], so H P assembles from the camera strip and
    the per-slot strips -- ~30x fewer MXU FLOPs than the dense product.
    The slot-strip term reshapes P's rows to (F, 6, N), which a row/tile
    sharding of P CANNOT survive: GSPMD replicates the strips (measured
    38.6 MB of the 80.6 MB/step per-device budget at N=1664,
    tools/sharding_diag.py).

    ``dense`` (sharded default, config.hp_layout): materialize the dense
    (2F, N) H (a replicated scatter of the small Hf blocks) and take two
    plain matmuls H @ P and (H P) @ H^T -- the extra FLOPs are MXU noise
    at these sizes, and both contractions partition cleanly over P's
    sharded dims (partial-sum all-reduces of the small factors, never a
    strip replication).
    """
    F = Hc.shape[0]
    end = CAM_DIM + F * FEAT_DIM
    N = P.shape[0]
    if layout == "dense":
        H = dense_H(Hc, Hf, N)                           # (2F, N)
        HP = H @ P
        S = HP @ H.T
        return HP, S
    Pc = P[:CAM_DIM, :]                                  # (13, N)
    Pf = P[CAM_DIM:end, :].reshape(F, FEAT_DIM, N)
    HP = (jnp.einsum("fic,cn->fin", Hc[:, :, :CAM_DIM], Pc)
          + jnp.einsum("fid,fdn->fin", Hf, Pf)).reshape(2 * F, N)
    S = HP[:, :CAM_DIM] @ Hc[:, :, :CAM_DIM].reshape(2 * F, CAM_DIM).T
    HPf = HP[:, CAM_DIM:end].reshape(2 * F, F, FEAT_DIM)
    S = S + jnp.einsum("ajd,jid->aji", HPf, Hf).reshape(2 * F, 2 * F)
    return HP, S


def diag_blocks_2x2(Sfull: jnp.ndarray) -> jnp.ndarray:
    """(2F, 2F) -> (F, 2, 2) diagonal blocks, as a one-hot contraction
    (scattered 2x2 gathers cost ~10 ns/element on TPU; the masked matmul
    runs on the MXU)."""
    F2 = Sfull.shape[0]
    F = F2 // 2
    dtype = Sfull.dtype
    rows = Sfull.reshape(F, 2, F2)
    sel = (jnp.arange(F2)[None, None, :]
           == (2 * jnp.arange(F)[:, None] + jnp.arange(2)[None, :])[:, :, None]
           ).astype(dtype)                               # (F, 2, 2F) one-hot
    return jnp.einsum("fin,fjn->fij", rows, sel)


def innovation_covariances(P: jnp.ndarray, Hc: jnp.ndarray, Hf: jnp.ndarray
                           ) -> jnp.ndarray:
    """S_i = H_i P H_i^T + I per slot (makeMeasurementCovariance,
    MeasurementPrediction.cpp:595-658; R_i is the 2x2 identity, :647-653).
    """
    _, Sfull = hp_products(P, Hc, Hf)
    return diag_blocks_2x2(Sfull) + jnp.eye(2, dtype=P.dtype)[None, :, :]


def dense_H(Hc: jnp.ndarray, Hf: jnp.ndarray, n_total: int = 0
            ) -> jnp.ndarray:
    """Assemble the sparse per-slot Jacobians into dense H (2F, N).

    Row block i has Hc_i in the camera columns and Hf_i in slot i's columns
    (joinJacobians, Update.cpp:222-232, without the compaction).
    ``n_total`` >= 13 + 6F appends zero columns for padding dims.
    """
    F = Hc.shape[0]
    dtype = Hc.dtype
    idx = jnp.arange(F)
    feat_block = jnp.zeros((F, 2, F, FEAT_DIM), dtype=dtype)
    feat_block = feat_block.at[idx, :, idx, :].set(Hf)
    parts = [Hc, feat_block.reshape(F, 2, F * FEAT_DIM)]
    logical = CAM_DIM + F * FEAT_DIM
    if n_total and n_total > logical:
        parts.append(jnp.zeros((F, 2, n_total - logical), dtype=dtype))
    H = jnp.concatenate(parts, axis=-1)
    return H.reshape(2 * F, max(n_total, logical))
