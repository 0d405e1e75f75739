"""Feature-initialization chain (value + Jacobians) as ONE Pallas kernel.

filter/features.py initializes new landmarks with ``jax.vmap(jacfwd)``
of the init chain (undistort -> back-project -> rotate -> bearing
angles, AddMapFeature.cpp:293-350) -- correct, but the jvp machinery
compiles to ~100 tiny (C,)-shaped fusions that dominate add frames
(~100 us at the ~1.2 us/kernel dispatch floor; features.py is the #4
line in the per-source trace).  Here the chain and its HAND-DERIVED
Jacobians run as one VPU kernel with candidates on the lanes, exactly
like ops/measure_kernel.py does for the measurement chain.

The derivative math (all per-lane scalars):

  undistort (one-shot polynomial, AddMapFeature.cpp:42-58):
      d du'/du = d + du g 2 mx dx,   g = k1 + 2 k2 r2
  ray = [du'/fx, dv'/fy, 1];  g_w = R(q) ray;
  d(R(q) v)/dq columns from the standard quaternion-rotation derivative;
  theta = atan2(gx, gz), phi = atan2(-gy, |(gx, gz)|) with their
  closed-form gradients.

J1 = d(feat)/d(r, q) is [I3 | 0] on the anchor rows and nonzero only in
the (theta, phi) x q block; J2 = d(feat)/d(u, v, rho) is nonzero only
in (theta, phi) x (u, v) plus the unit rho entry -- the kernel returns
just those dense blocks and the caller scatters them into the padded
(C, 6, 7) / (C, 6, 3) shapes the covariance einsums expect.

Equivalence with the vmapped-jacfwd chain (which stays as the CPU /
float64 / independent-check path) is locked by tests/test_update_kernel
.py::test_init_kernel_matches_jacfwd to f32 roundoff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openekfmonoslam_tpu.core.camera import Camera

_LANE = 128
N_OUT = 15     # gx, gz, dth/dq (4), dph/dq (4), dth/du, dth/dv,
               # dph/du, dph/dv, gy


def _init_kernel(cam_ref, uv_ref, out_ref, *, cp):
    (fx, fy, cx, cy, k1, k2, dxc, dyc) = cp
    qw = cam_ref[0, 3]
    qx = cam_ref[0, 4]
    qy = cam_ref[0, 5]
    qz = cam_ref[0, 6]

    u = uv_ref[0, :]
    v = uv_ref[1, :]

    # one-shot undistort + its (u, v) Jacobian
    du = u - cx
    dv = v - cy
    mx = dxc * du
    my = dyc * dv
    r2 = mx * mx + my * my
    d = 1.0 + k1 * r2 + k2 * r2 * r2
    g2 = 2.0 * (k1 + 2.0 * k2 * r2)
    dup = du * d                       # du' = u_undist - cx
    dvp = dv * d
    ddup_du = d + du * g2 * mx * dxc
    ddup_dv = du * g2 * my * dyc
    ddvp_du = dv * g2 * mx * dxc
    ddvp_dv = d + dv * g2 * my * dyc

    # unit-depth ray (a, b, 1) and rotation to world
    a = dup / fx
    b = dvp / fy
    da_du = ddup_du / fx
    da_dv = ddup_dv / fx
    db_du = ddvp_du / fy
    db_dv = ddvp_dv / fy

    w2, x2, y2, z2 = qw * qw, qx * qx, qy * qy, qz * qz
    R = ((w2 + x2 - y2 - z2, 2 * (qx * qy - qw * qz),
          2 * (qz * qx + qw * qy)),
         (2 * (qx * qy + qw * qz), w2 - x2 + y2 - z2,
          2 * (qy * qz - qw * qx)),
         (2 * (qz * qx - qw * qy), 2 * (qy * qz + qw * qx),
          w2 - x2 - y2 + z2))
    gx = R[0][0] * a + R[0][1] * b + R[0][2]
    gy = R[1][0] * a + R[1][1] * b + R[1][2]
    gz = R[2][0] * a + R[2][1] * b + R[2][2]

    # d(R(q) v)/dq for v = (a, b, 1): dR/dq_k contracted with v
    dg_dq = (
        (2 * (qw * a - qz * b + qy), 2 * (qz * a + qw * b - qx),
         2 * (-qy * a + qx * b + qw)),                       # d/dw
        (2 * (qx * a + qy * b + qz), 2 * (qy * a - qx * b - qw),
         2 * (qz * a + qw * b - qx)),                        # d/dx
        (2 * (-qy * a + qx * b + qw), 2 * (qx * a + qy * b + qz),
         2 * (-qw * a + qz * b - qy)),                       # d/dy
        (2 * (-qz * a - qw * b + qx), 2 * (qw * a - qz * b + qy),
         2 * (qx * a + qy * b + qz)),                        # d/dz
    )

    # bearing-angle GRADIENTS w.r.t. the world ray (rational functions;
    # the atan2 values themselves are computed by the caller in XLA --
    # Mosaic has no atan2 lowering)
    hxz2 = gx * gx + gz * gz
    h = jnp.sqrt(hxz2)
    dth_dgx = gz / hxz2
    dth_dgz = -gx / hxz2
    den = gy * gy + hxz2
    dph_dgy = -h / den
    dph_dh = gy / den
    dph_dgx = dph_dh * gx / h
    dph_dgz = dph_dh * gz / h

    out_ref[0, :] = gx
    out_ref[1, :] = gz
    out_ref[14, :] = gy
    for k in range(4):
        dgxk, dgyk, dgzk = dg_dq[k]
        out_ref[2 + k, :] = dth_dgx * dgxk + dth_dgz * dgzk
        out_ref[6 + k, :] = (dph_dgx * dgxk + dph_dgy * dgyk
                             + dph_dgz * dgzk)
    # d(theta, phi)/d(u, v) through the ray
    dgx_du = R[0][0] * da_du + R[0][1] * db_du
    dgx_dv = R[0][0] * da_dv + R[0][1] * db_dv
    dgy_du = R[1][0] * da_du + R[1][1] * db_du
    dgy_dv = R[1][0] * da_dv + R[1][1] * db_dv
    dgz_du = R[2][0] * da_du + R[2][1] * db_du
    dgz_dv = R[2][0] * da_dv + R[2][1] * db_dv
    out_ref[10, :] = dth_dgx * dgx_du + dth_dgz * dgz_du
    out_ref[11, :] = dth_dgx * dgx_dv + dth_dgz * dgz_dv
    out_ref[12, :] = dph_dgx * dgx_du + dph_dgy * dgy_du + dph_dgz * dgz_du
    out_ref[13, :] = dph_dgx * dgx_dv + dph_dgy * dgy_dv + dph_dgz * dgz_dv


def init_chain_pallas(camera: Camera, cam7: jnp.ndarray,
                      cand_uv: jnp.ndarray, rho0):
    """(feats (C, 6), J1 (C, 6, 7), J2 (C, 6, 3)) -- the same arrays
    vmap(jacfwd(init_feature)) produces, from one kernel launch."""
    C = cand_uv.shape[0]
    Cp = ((C + _LANE - 1) // _LANE) * _LANE
    f32 = jnp.float32
    cp = tuple(float(x) for x in (camera.fx, camera.fy, camera.cx,
                                  camera.cy, camera.k1, camera.k2,
                                  camera.dx, camera.dy))
    cam_in = jnp.zeros((1, _LANE), f32).at[0, :7].set(
        cam7.astype(f32))
    uv_in = jnp.zeros((2, Cp), f32).at[:, :C].set(
        cand_uv.astype(f32).T)
    out = pl.pallas_call(
        functools.partial(_init_kernel, cp=cp),
        out_shape=jax.ShapeDtypeStruct((N_OUT, Cp), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cam_in, uv_in)

    gx = out[0, :C]
    gz = out[1, :C]
    gy = out[14, :C]
    theta = jnp.arctan2(gx, gz)
    phi = jnp.arctan2(-gy, jnp.sqrt(gx * gx + gz * gz))
    feats = jnp.concatenate([
        jnp.broadcast_to(cam7[:3].astype(f32), (C, 3)),
        theta[:, None], phi[:, None],
        jnp.full((C, 1), rho0, f32)], axis=1)

    J1 = jnp.zeros((C, 6, 7), f32)
    J1 = J1.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0).at[:, 2, 2].set(1.0)
    J1 = J1.at[:, 3, 3:7].set(out[2:6, :C].T)
    J1 = J1.at[:, 4, 3:7].set(out[6:10, :C].T)

    J2 = jnp.zeros((C, 6, 3), f32)
    J2 = J2.at[:, 3, 0:2].set(out[10:12, :C].T)
    J2 = J2.at[:, 4, 0:2].set(out[12:14, :C].T)
    J2 = J2.at[:, 5, 2].set(1.0)
    return feats, J1, J2


def init_kernel_applicable(dtype) -> bool:
    return dtype == jnp.float32 and jax.default_backend() == "tpu"
