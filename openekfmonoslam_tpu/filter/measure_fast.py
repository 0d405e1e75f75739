"""Analytic measurement Jacobians, structure-of-arrays, fusion-friendly.

Drop-in replacement for the jacfwd path in filter/measure.py.  The
vmapped `jax.jacfwd(measure_one)` is mathematically exact but compiles to
~60-100 tiny XLA fusions per call (the jvp chain is full of per-slot
stacks/slices/transposes that break elementwise fusion), and the step
calls it twice per frame -- on a dispatch-latency-bound device that is
~0.4 ms of pure kernel-launch overhead (BASELINE.md roofline).  This
module computes THE SAME derivative with the hand chain rule written
over (F,)-component arrays: one long elementwise dataflow plus a handful
of final stacks, which XLA fuses to a few kernels.

The chain mirrors the reference's correct-math structure
(MeasurementPrediction.cpp:273-589 WITHOUT its transcription quirks --
no jacobian[1] slip, rotated drho column, exact implicit-function
distortion derivative), which eval/oracle.py::OracleQuirks.none()
already implements in NumPy and which the jacfwd path matches to 1e-13
(tests/test_oracle_parity.py).  Equivalence of this module against the
jacfwd path is locked elementwise by tests/test_measure_fast.py.

  h(x) = distort(project(R(q)^T a)),   a = p - r          (XYZ)
                                       a = rho (p0 - r) + m(theta, phi)
                                                           (inverse depth)

  dh/d(r, q, feat) = IDJ @ FPJ @ [d p_cam/d(...)]
    FPJ = d(project)/d(p_cam)          (2x3, :343-362)
    IDJ = d(distort)/d(uv_undist)      (2x2, implicit diff of the Newton
                                        radius equation)
"""

from __future__ import annotations

import jax.numpy as jnp

from openekfmonoslam_tpu.core.camera import Camera, _NEWTON_ITERS
from openekfmonoslam_tpu.filter.state import SlamState
from openekfmonoslam_tpu.filter.measure import Prediction
from openekfmonoslam_tpu.core import camera as cam_mod


def _rotation_T(q):
    """Rows of R(q)^T as 9 scalars (R as in quat.to_rotation_matrix)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    # R[i][j]; Rt[i][j] = R[j][i]
    r00 = w2 + x2 - y2 - z2
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (z * x + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = w2 - x2 + y2 - z2
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (z * x - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = w2 - x2 - y2 + z2
    return ((r00, r10, r20),
            (r01, r11, r21),
            (r02, r12, r22))


def measurements_with_jacobians(camera: Camera, cam7: jnp.ndarray,
                                feats: jnp.ndarray, is_xyz: jnp.ndarray,
                                quirks: bool = False):
    """(uv (F,2), Hc7 (F,2,7), Hf (F,2,6)) -- same contract (and same
    derivative) as vmap(_measure_with_jac), via the analytic chain.

    ``quirks`` switches the H chain to the reference's transcribed bugs
    (the engine-side bug-compatible mode; eval/oracle.py::OracleQuirks
    documents each with citations):
      * the jacobian[1]/[2] slip -- dh/dr uses -R^T with entry (0,1)
        zeroed (MeasurementPrediction.cpp:371-394);
      * the unrotated drho column -- Hf[:, 5] carries the world-frame
        anchor offset, not R^T (p0 - r) (:553-580);
      * the hand-chain distortion Jacobian -- IDJ is the inverse of the
        one-shot undistort Jacobian at the distorted pixel (:308-337)
        instead of the exact implicit derivative of the Newton inversion.
    The measurement VALUE h(x) is identical in both modes."""
    dtype = feats.dtype
    r = cam7[0:3]
    q = cam7[3:7]
    Rt = _rotation_T(q)                      # Rt[i][j] scalars

    theta, phi, rho = feats[:, 3], feats[:, 4], feats[:, 5]
    cph, sph = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    mx_, my_, mz_ = cph * sth, -sph, cph * cth          # m(theta, phi)

    ox = feats[:, 0] - r[0]                             # anchor - r
    oy = feats[:, 1] - r[1]
    oz = feats[:, 2] - r[2]
    xyzf = is_xyz.astype(dtype)
    inv = 1.0 - xyzf
    # a = XYZ ? (p - r) : rho (p0 - r) + m
    ax = jnp.where(is_xyz, ox, rho * ox + mx_)
    ay = jnp.where(is_xyz, oy, rho * oy + my_)
    az = jnp.where(is_xyz, oz, rho * oz + mz_)

    def rt_mul(vx, vy, vz):
        return (Rt[0][0] * vx + Rt[0][1] * vy + Rt[0][2] * vz,
                Rt[1][0] * vx + Rt[1][1] * vy + Rt[1][2] * vz,
                Rt[2][0] * vx + Rt[2][1] * vy + Rt[2][2] * vz)

    px, py, pz = rt_mul(ax, ay, az)                     # p_cam
    pz = jnp.where(jnp.abs(pz) < 1e-6, 1.0, pz)         # z clamp (measure_one)

    # ---- projection + distortion (value), mirrors cam_mod.project/distort
    fx, fy, cx, cy = camera.fx, camera.fy, camera.cx, camera.cy
    k1, k2, dx_, dy_ = camera.k1, camera.k2, camera.dx, camera.dy
    inv_z = 1.0 / pz
    uu = cx + fx * px * inv_z                           # undistorted pixel
    vu = cy + fy * py * inv_z
    du = uu - cx
    dv = vu - cy
    mx = dx_ * du
    my = dy_ * dv
    r2 = jnp.maximum(mx * mx + my * my, 1e-12)
    ru = jnp.sqrt(r2)
    rd = ru / (1.0 + k1 * r2 + k2 * r2 * r2)
    for _ in range(_NEWTON_ITERS):
        rd2 = rd * rd
        fv = rd + k1 * rd2 * rd + k2 * rd2 * rd2 * rd - ru
        fp = 1.0 + 3.0 * k1 * rd2 + 5.0 * k2 * rd2 * rd2
        rd = rd - fv / fp
    # final IFT step exactly as cam_mod.distort: gp is g' at the
    # PRE-step radius (what jacfwd's tangent flows through), the value
    # uses the post-step radius
    rd_s = rd
    rd2s = rd_s * rd_s
    fv = rd_s + k1 * rd2s * rd_s + k2 * rd2s * rd2s * rd_s - ru
    gp = 1.0 + 3.0 * k1 * rd2s + 5.0 * k2 * rd2s * rd2s  # g'(rd_s)
    rd = rd_s - fv / gp
    rd2 = rd * rd
    d = 1.0 + k1 * rd2 + k2 * rd2 * rd2
    ud = cx + du / d
    vd = cy + dv / d
    uv = jnp.stack([ud, vd], axis=-1)

    if quirks:
        # ---- IDJ = inv(one-shot undistort Jacobian at the DISTORTED
        # pixel) (makeJacobianOfDistortionFunction,
        # MeasurementPrediction.cpp:308-337, inverted by
        # makeJacobianOfProjection :343-362) -- NOT the derivative of the
        # Newton-inverted h actually evaluated above; off by
        # O((k1 r^2)^2) relative, exactly as the reference is.
        pdx = ud - cx
        pdy = vd - cy
        mxq = dx_ * pdx
        myq = dy_ * pdy
        r2q = mxq * mxq + myq * myq
        radq = 1.0 + k1 * r2q + k2 * r2q * r2q
        gq = k1 + 2.0 * k2 * r2q
        u00 = radq + pdx * gq * 2.0 * pdx * dx_ * dx_
        u01 = pdx * gq * 2.0 * pdy * dy_ * dy_
        u10 = pdy * gq * 2.0 * pdx * dx_ * dx_
        u11 = radq + pdy * gq * 2.0 * pdy * dy_ * dy_
        detq = u00 * u11 - u01 * u10
        i00 = u11 / detq
        i01 = -u01 / detq
        i10 = -u10 / detq
        i11 = u00 / detq
    else:
        # ---- IDJ = d(distort)/d(uv_undist) (implicit function theorem) --
        dd_drd = 2.0 * k1 * rd + 4.0 * k2 * rd * rd2
        cmul = dd_drd / (gp * ru)
        # dd/ddu = cmul * (dx^2 du, dy^2 dv);
        # J = I/d - outer(du,dv) dd / d^2
        inv_d = 1.0 / d
        inv_d2 = inv_d * inv_d
        i00 = inv_d - du * cmul * dx_ * dx_ * du * inv_d2
        i01 = -du * cmul * dy_ * dy_ * dv * inv_d2
        i10 = -dv * cmul * dx_ * dx_ * du * inv_d2
        i11 = inv_d - dv * cmul * dy_ * dy_ * dv * inv_d2

    # ---- FPJ = d(project)/d(p_cam) ----
    f00 = fx * inv_z
    f02 = -px * fx * inv_z * inv_z
    f11 = fy * inv_z
    f12 = -py * fy * inv_z * inv_z
    # proj = IDJ @ FPJ  (2x3)
    p00 = i00 * f00
    p01 = i01 * f11
    p02 = i00 * f02 + i01 * f12
    p10 = i10 * f00
    p11 = i11 * f11
    p12 = i10 * f02 + i11 * f12

    def proj_mul(vx, vy, vz):
        """(2,) rows of proj @ v for per-slot vector components."""
        return (p00 * vx + p01 * vy + p02 * vz,
                p10 * vx + p11 * vy + p12 * vz)

    # ---- dh/dr = -s proj @ Rt, s = XYZ ? 1 : rho ----
    s = jnp.where(is_xyz, jnp.ones_like(rho), rho)
    prt = [rt_mul(*e) for e in ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                                (0.0, 0.0, 1.0))]      # columns of Rt
    if quirks:
        # jacobian[1] is never written in the reference's -R^T transcript
        # (jacobian[2] is written twice, MeasurementPrediction.cpp:371-373
        # and the rho-scaled variant :392-394): entry (0,1) of the dh/dr
        # chain's -R^T stays zero.  dh/dr only -- dh/dq, Hf and the value
        # use the true R^T.
        drt = list(prt)
        drt[1] = (0.0, prt[1][1], prt[1][2])
    else:
        drt = prt
    # proj @ Rt columns
    pRd = [proj_mul(*col) for col in drt]              # dh/dr chain
    pR = ([proj_mul(*col) for col in prt] if quirks else pRd)  # Hf chain
    dh_dr = [(-s * pRd[j][i]) for j in range(3) for i in range(2)]
    # index [j*2+i] = (row i, col j)

    # ---- dh/dq: d(R(q)^T a)/dq = dR_a_dq(q_conj, a) . diag(1,-1,-1,-1)
    w, qx, qy, qz = q[0], -q[1], -q[2], -q[3]          # q_conj
    # column vectors of d(R(qc) a)/d(qc_k), then chain sign for k>=1
    c0 = (2 * (w * ax - qz * ay + qy * az),
          2 * (qz * ax + w * ay - qx * az),
          2 * (-qy * ax + qx * ay + w * az))
    c1 = (2 * (qx * ax + qy * ay + qz * az),
          2 * (qy * ax - qx * ay - w * az),
          2 * (qz * ax + w * ay - qx * az))
    c2 = (2 * (-qy * ax + qx * ay + w * az),
          2 * (qx * ax + qy * ay + qz * az),
          2 * (-w * ax + qz * ay - qy * az))
    c3 = (2 * (-qz * ax - w * ay + qx * az),
          2 * (w * ax - qz * ay + qy * az),
          2 * (qx * ax + qy * ay + qz * az))
    sgn = (1.0, -1.0, -1.0, -1.0)
    dh_dq = []
    for k, ck in enumerate((c0, c1, c2, c3)):
        rows = proj_mul(*ck)
        dh_dq.append((sgn[k] * rows[0], sgn[k] * rows[1]))

    # ---- Hf ----
    # XYZ:       proj @ Rt                  (cols 0:3; 3:6 zero)
    # inv-depth: [rho proj Rt | projRt dm_dtheta | projRt dm_dphi |
    #             proj Rt (p0 - r)]
    dmth = (cph * cth, jnp.zeros_like(cph), -cph * sth)
    dmph = (-sph * sth, -cph, -sph * cth)
    pR_dmth = proj_mul(*rt_mul(*dmth))
    pR_dmph = proj_mul(*rt_mul(*dmph))
    if quirks:
        # the unrotated drho column: the reference computes the rotated
        # offset but uses the WORLD-frame (p0 - r) in the rho column
        # (MeasurementPrediction.cpp:553-580)
        pR_off = proj_mul(ox, oy, oz)
    else:
        pR_off = proj_mul(*rt_mul(ox, oy, oz))
    hf_cols = []
    for j in range(3):                                  # anchor / position
        col = (jnp.where(is_xyz, pR[j][0], rho * pR[j][0]),
               jnp.where(is_xyz, pR[j][1], rho * pR[j][1]))
        hf_cols.append(col)
    hf_cols.append((inv * pR_dmth[0], inv * pR_dmth[1]))
    hf_cols.append((inv * pR_dmph[0], inv * pR_dmph[1]))
    hf_cols.append((inv * pR_off[0], inv * pR_off[1]))

    F = feats.shape[0]
    # ONE flat stack per output, reshaped -- the nested per-row stacks
    # compiled to a cascade of small concatenate/transpose kernels
    # (~14 us/frame of the dispatch tail); a single (F, 14) stack is one
    # kernel and the reshape is free
    Hc7 = jnp.stack(
        [dh_dr[0], dh_dr[2], dh_dr[4],
         dh_dq[0][0], dh_dq[1][0], dh_dq[2][0], dh_dq[3][0],
         dh_dr[1], dh_dr[3], dh_dr[5],
         dh_dq[0][1], dh_dq[1][1], dh_dq[2][1], dh_dq[3][1]],
        axis=-1).reshape(F, 2, 7)
    Hf = jnp.stack(
        [hf_cols[0][0], hf_cols[1][0], hf_cols[2][0],
         hf_cols[3][0], hf_cols[4][0], hf_cols[5][0],
         hf_cols[0][1], hf_cols[1][1], hf_cols[2][1],
         hf_cols[3][1], hf_cols[4][1], hf_cols[5][1]],
        axis=-1).reshape(F, 2, 6)
    return uv, Hc7, Hf


def visibility(camera: Camera, cam7: jnp.ndarray, feats: jnp.ndarray,
               is_xyz: jnp.ndarray, active: jnp.ndarray, uv: jnp.ndarray
               ) -> jnp.ndarray:
    """Same gate as measure.predict_measurements (SoA p_cam recompute is
    cheaper than keeping the vmapped point_in_camera_frame alive)."""
    r, q = cam7[0:3], cam7[3:7]
    Rt = _rotation_T(q)
    theta, phi, rho = feats[:, 3], feats[:, 4], feats[:, 5]
    cph, sph = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    ox, oy, oz = (feats[:, 0] - r[0], feats[:, 1] - r[1], feats[:, 2] - r[2])
    ax = jnp.where(is_xyz, ox, rho * ox + cph * sth)
    ay = jnp.where(is_xyz, oy, rho * oy + (-sph))
    az = jnp.where(is_xyz, oz, rho * oz + cph * cth)
    px = Rt[0][0] * ax + Rt[0][1] * ay + Rt[0][2] * az
    py = Rt[1][0] * ax + Rt[1][1] * ay + Rt[1][2] * az
    pz = Rt[2][0] * ax + Rt[2][1] * ay + Rt[2][2] * az
    p_cam = jnp.stack([px, py, pz], axis=-1)
    return (active
            & cam_mod.in_front_and_in_fov(camera, p_cam)
            & cam_mod.in_image(camera, uv))
