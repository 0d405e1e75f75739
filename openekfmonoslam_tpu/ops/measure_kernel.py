"""The analytic measurement chain as ONE Pallas VPU kernel.

filter/measure_fast.py's structure-of-arrays chain is mathematically one
long elementwise dataflow over (F,)-vectors, but XLA compiles it (plus
the visibility gate and the final stacks) to ~60-80 tiny fusions whose
~1.2 us/kernel dispatch floor dominates their work (~25-30 us/frame,
per-source-line trace attribution; the chain runs twice per frame --
measurement prediction and the post-update re-prediction).  Here the
whole chain runs as ONE kernel on (R, 128)-padded lane vectors: every
scalar of the SoA chain becomes one VPU row op, F=96 slots ride the
lanes, and the outputs come back packed as rows:

    out[0:2]    u, v          (predicted distorted pixel)
    out[2]      vis           (1.0 = visible)
    out[3:17]   Hc rows       (row-major (2, 7): dh/d(r, q))
    out[17:29]  Hf rows       (row-major (2, 6))

The caller (filter/measure.py) unpacks with two cheap reshapes.  The
math is line-for-line the measure_fast chain (same reference citations,
including the ``quirks`` bug-compatible variants); bit-level agreement
with the XLA path is not guaranteed (fp reassociation) but elementwise
agreement to f32 roundoff is locked by tests/test_measure_kernel.py.

Only the single-chip float32 TPU path uses this kernel
(config.measure_kernel); CPU tests, float64 parity replays and sharded
runs keep the XLA chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openekfmonoslam_tpu.core.camera import Camera, _NEWTON_ITERS

_LANE = 128
N_OUT = 29


def _kernel(cam7_ref, feats_ref, flags_ref, out_ref, *, cp, quirks):
    (fx, fy, cx, cy, k1, k2, dx_, dy_, tanx, tany, px, py) = cp

    r0 = cam7_ref[0, 0]
    r1 = cam7_ref[0, 1]
    r2 = cam7_ref[0, 2]
    w = cam7_ref[0, 3]
    qx = cam7_ref[0, 4]
    qy = cam7_ref[0, 5]
    qz = cam7_ref[0, 6]

    w2, x2, y2, z2 = w * w, qx * qx, qy * qy, qz * qz
    # Rt[i][j] = R[j][i] (scalars)
    Rt = ((w2 + x2 - y2 - z2, 2 * (qx * qy + w * qz), 2 * (qz * qx - w * qy)),
          (2 * (qx * qy - w * qz), w2 - x2 + y2 - z2, 2 * (qy * qz + w * qx)),
          (2 * (qz * qx + w * qy), 2 * (qy * qz - w * qx),
           w2 - x2 - y2 + z2))

    fx0 = feats_ref[0, :]
    fy1 = feats_ref[1, :]
    fz2 = feats_ref[2, :]
    theta = feats_ref[3, :]
    phi = feats_ref[4, :]
    rho = feats_ref[5, :]
    is_xyz = flags_ref[0, :] > 0.5
    active = flags_ref[1, :] > 0.5

    cph, sph = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    mx_, my_, mz_ = cph * sth, -sph, cph * cth

    ox = fx0 - r0
    oy = fy1 - r1
    oz = fz2 - r2
    ax = jnp.where(is_xyz, ox, rho * ox + mx_)
    ay = jnp.where(is_xyz, oy, rho * oy + my_)
    az = jnp.where(is_xyz, oz, rho * oz + mz_)

    def rt_mul(vx, vy, vz):
        return (Rt[0][0] * vx + Rt[0][1] * vy + Rt[0][2] * vz,
                Rt[1][0] * vx + Rt[1][1] * vy + Rt[1][2] * vz,
                Rt[2][0] * vx + Rt[2][1] * vy + Rt[2][2] * vz)

    pxc, pyc, pzc = rt_mul(ax, ay, az)
    pz_safe = jnp.where(jnp.abs(pzc) < 1e-6, 1.0, pzc)

    inv_z = 1.0 / pz_safe
    uu = cx + fx * pxc * inv_z
    vu = cy + fy * pyc * inv_z
    du = uu - cx
    dv = vu - cy
    mx = dx_ * du
    my = dy_ * dv
    r2m = jnp.maximum(mx * mx + my * my, 1e-12)
    ru = jnp.sqrt(r2m)
    rd = ru / (1.0 + k1 * r2m + k2 * r2m * r2m)
    for _ in range(_NEWTON_ITERS):
        rd2 = rd * rd
        fv = rd + k1 * rd2 * rd + k2 * rd2 * rd2 * rd - ru
        fp = 1.0 + 3.0 * k1 * rd2 + 5.0 * k2 * rd2 * rd2
        rd = rd - fv / fp
    rd_s = rd
    rd2s = rd_s * rd_s
    fv = rd_s + k1 * rd2s * rd_s + k2 * rd2s * rd2s * rd_s - ru
    gp = 1.0 + 3.0 * k1 * rd2s + 5.0 * k2 * rd2s * rd2s
    rd = rd_s - fv / gp
    rd2 = rd * rd
    d = 1.0 + k1 * rd2 + k2 * rd2 * rd2
    ud = cx + du / d
    vd = cy + dv / d

    if quirks:
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
        dd_drd = 2.0 * k1 * rd + 4.0 * k2 * rd * rd2
        cmul = dd_drd / (gp * ru)
        inv_d = 1.0 / d
        inv_d2 = inv_d * inv_d
        i00 = inv_d - du * cmul * dx_ * dx_ * du * inv_d2
        i01 = -du * cmul * dy_ * dy_ * dv * inv_d2
        i10 = -dv * cmul * dx_ * dx_ * du * inv_d2
        i11 = inv_d - dv * cmul * dy_ * dy_ * dv * inv_d2

    f00 = fx * inv_z
    f02 = -pxc * fx * inv_z * inv_z
    f11 = fy * inv_z
    f12 = -pyc * fy * inv_z * inv_z
    p00 = i00 * f00
    p01 = i01 * f11
    p02 = i00 * f02 + i01 * f12
    p10 = i10 * f00
    p11 = i11 * f11
    p12 = i10 * f02 + i11 * f12

    def proj_mul(vx, vy, vz):
        return (p00 * vx + p01 * vy + p02 * vz,
                p10 * vx + p11 * vy + p12 * vz)

    s = jnp.where(is_xyz, jnp.ones_like(rho), rho)
    prt = [rt_mul(*e) for e in ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                                (0.0, 0.0, 1.0))]
    if quirks:
        drt = list(prt)
        drt[1] = (0.0, prt[1][1], prt[1][2])
    else:
        drt = prt
    pRd = [proj_mul(*col) for col in drt]
    pR = ([proj_mul(*col) for col in prt] if quirks else pRd)
    dh_dr = [(-s * pRd[j][i]) for j in range(3) for i in range(2)]

    wq, cqx, cqy, cqz = w, -qx, -qy, -qz
    c0 = (2 * (wq * ax - cqz * ay + cqy * az),
          2 * (cqz * ax + wq * ay - cqx * az),
          2 * (-cqy * ax + cqx * ay + wq * az))
    c1 = (2 * (cqx * ax + cqy * ay + cqz * az),
          2 * (cqy * ax - cqx * ay - wq * az),
          2 * (cqz * ax + wq * ay - cqx * az))
    c2 = (2 * (-cqy * ax + cqx * ay + wq * az),
          2 * (cqx * ax + cqy * ay + cqz * az),
          2 * (-wq * ax + cqz * ay - cqy * az))
    c3 = (2 * (-cqz * ax - wq * ay + cqx * az),
          2 * (wq * ax - cqz * ay + cqy * az),
          2 * (cqx * ax + cqy * ay + cqz * az))
    sgn = (1.0, -1.0, -1.0, -1.0)
    dh_dq = []
    for k, ck in enumerate((c0, c1, c2, c3)):
        rows = proj_mul(*ck)
        dh_dq.append((sgn[k] * rows[0], sgn[k] * rows[1]))

    inv = jnp.where(is_xyz, 0.0, 1.0)
    dmth = (cph * cth, jnp.zeros_like(cph), -cph * sth)
    dmph = (-sph * sth, -cph, -sph * cth)
    pR_dmth = proj_mul(*rt_mul(*dmth))
    pR_dmph = proj_mul(*rt_mul(*dmph))
    if quirks:
        pR_off = proj_mul(ox, oy, oz)
    else:
        pR_off = proj_mul(*rt_mul(ox, oy, oz))
    hf_cols = []
    for j in range(3):
        col = (jnp.where(is_xyz, pR[j][0], rho * pR[j][0]),
               jnp.where(is_xyz, pR[j][1], rho * pR[j][1]))
        hf_cols.append(col)
    hf_cols.append((inv * pR_dmth[0], inv * pR_dmth[1]))
    hf_cols.append((inv * pR_dmph[0], inv * pR_dmph[1]))
    hf_cols.append((inv * pR_off[0], inv * pR_off[1]))

    # visibility (in_front_and_in_fov + in_image on the true p_cam)
    visb = (active
            & (pzc > 0)
            & (jnp.abs(pxc) < pzc * tanx)
            & (jnp.abs(pyc) < pzc * tany)
            & (ud > 0) & (ud < px) & (vd > 0) & (vd < py))
    vis = visb.astype(jnp.float32)

    out_ref[0, :] = ud
    out_ref[1, :] = vd
    out_ref[2, :] = vis
    # Hc row-major (i, col): rows 3..9 = i=0 cols r0 r1 r2 q0 q1 q2 q3
    out_ref[3, :] = dh_dr[0]
    out_ref[4, :] = dh_dr[2]
    out_ref[5, :] = dh_dr[4]
    out_ref[6, :] = dh_dq[0][0]
    out_ref[7, :] = dh_dq[1][0]
    out_ref[8, :] = dh_dq[2][0]
    out_ref[9, :] = dh_dq[3][0]
    out_ref[10, :] = dh_dr[1]
    out_ref[11, :] = dh_dr[3]
    out_ref[12, :] = dh_dr[5]
    out_ref[13, :] = dh_dq[0][1]
    out_ref[14, :] = dh_dq[1][1]
    out_ref[15, :] = dh_dq[2][1]
    out_ref[16, :] = dh_dq[3][1]
    for j in range(6):
        out_ref[17 + j, :] = hf_cols[j][0]
        out_ref[23 + j, :] = hf_cols[j][1]


def measure_chain_pallas(camera: Camera, cam7: jnp.ndarray,
                         feats: jnp.ndarray, is_xyz: jnp.ndarray,
                         active: jnp.ndarray, quirks: bool = False):
    """(uv (F,2), Hc7 (F,2,7), Hf (F,2,6), visible (F,) bool).

    Camera fields must be CONCRETE (the runtime's constants): they are
    baked into the kernel as compile-time scalars.  Callers jit around
    this function (the engine step); it is not jitted itself."""
    F = feats.shape[0]
    Fp = ((F + _LANE - 1) // _LANE) * _LANE
    cp = tuple(float(v) for v in (
        camera.fx, camera.fy, camera.cx, camera.cy, camera.k1, camera.k2,
        camera.dx, camera.dy, camera.tan_vision_x, camera.tan_vision_y,
        camera.pixels_x, camera.pixels_y))

    cam_in = jnp.zeros((1, _LANE), jnp.float32).at[0, :7].set(
        cam7.astype(jnp.float32))
    feats_in = jnp.zeros((6, Fp), jnp.float32).at[:, :F].set(
        feats.astype(jnp.float32).T)
    flags = jnp.zeros((2, Fp), jnp.float32)
    flags = flags.at[0, :F].set(is_xyz.astype(jnp.float32))
    flags = flags.at[1, :F].set(active.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_kernel, cp=cp, quirks=quirks),
        out_shape=jax.ShapeDtypeStruct((N_OUT, Fp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cam_in, feats_in, flags)

    uv = out[0:2, :F].T                                    # (F, 2)
    visible = out[2, :F] > 0.5
    Hc7 = out[3:17, :F].T.reshape(F, 2, 7)
    Hf = out[17:29, :F].T.reshape(F, 2, 6)
    return uv, Hc7, Hf, visible
