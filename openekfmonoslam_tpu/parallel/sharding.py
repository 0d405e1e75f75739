"""Multi-device sharding of the filter over a `jax.sharding.Mesh`.

No reference counterpart -- the reference is single-threaded C++ (SURVEY.md
section 2.7).  The scaling dimension of EKF-SLAM is the map: the dense
covariance P is (13 + 6 F)^2 and every hot step is a P-sized matmul
(predict cross strips, H P, (I - K H) P, batched RANSAC gains).  The
design:

  * P is block-row sharded over the mesh axis ``p``: each device owns a
    contiguous strip of rows.  Row-sharded P makes H P row-local
    (H is small and replicated) and the rank-2M downdate
    P -= K (H P) an outer product of a replicated (2M, N) with a sharded
    (N, 2M) -- XLA inserts the all-gathers/psums over ICI.
  * x, the slot metadata, and the image pipeline are replicated (tiny).

`make_sharded_step` returns the full frame step jitted with these
shardings; XLA partitions every P-sized op and places collectives.  This
is the configuration exercised by __graft_entry__.dryrun_multichip on a
virtual device mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.filter.state import SlamState


def make_mesh(devices=None, axis: str = "p") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def state_shardings(mesh: Mesh, axis: str = "p") -> SlamState:
    """A SlamState-shaped pytree of NamedShardings: P row-sharded, rest
    replicated."""
    rep = NamedSharding(mesh, P())
    return SlamState(
        x=rep,
        P=NamedSharding(mesh, P(axis, None)),
        active=rep,
        is_xyz=rep,
        times_predicted=rep,
        times_matched=rep,
        descriptors=rep,
        patch_pose=rep,
        birth=rep,
        rng=rep,
        frame=rep,
    )


def shard_state(state: SlamState, mesh: Mesh, axis: str = "p") -> SlamState:
    shardings = state_shardings(mesh, axis)
    return jax.tree.map(jax.device_put, state, shardings)


def _sharded_runtime(runtime: SlamRuntime) -> SlamRuntime:
    """The runtime re-resolved with the sharding-friendly H P layout
    where it is MEASURED to pay: the block-sparse assembly's (F, 6, N)
    strip reshape cannot be partitioned over P's sharded rows (GSPMD
    replicates the strips -- 38.6 MB of the 80.6 MB/step per-device
    budget at N=1664), and the dense-H matmuls partition cleanly (54.4
    MB/step at N=1664, a 33% cut).  Below N ~ 1024 the dense layout's
    partial-sum all-reduces cost MORE than the small strip gathers
    (measured 6.06 vs 2.74 MB/step at N=640), so maps under N=1024 dims
    keep "blocks" -- the switch is on N = 13 + 6 F, matching the
    measured crossover.  tools/sharding_diag.py re-measures both; an
    explicit config.hp_layout always wins."""
    import dataclasses

    from openekfmonoslam_tpu.engine.step import SlamRuntime as _RT
    cfg = runtime.config
    # Sharded runs always take the XLA measurement chain (config.py
    # contract): the single-device Pallas kernels are not written for
    # GSPMD partitioning and would at best force replication.
    n_dims = 13 + 6 * cfg.max_features
    want_dense = cfg.hp_layout != "dense" and n_dims >= 1024
    if (not want_dense and not cfg.measure_kernel
            and not cfg.update_kernel and not cfg.predict_kernel
            and not cfg.star_kernel and not cfg.init_kernel
            and not cfg.brief_kernel):
        return runtime
    repl = {"measure_kernel": False, "update_kernel": False,
            "predict_kernel": False, "star_kernel": False,
            "init_kernel": False, "brief_kernel": False}
    if want_dense:
        repl["hp_layout"] = "dense"
    return _RT(dataclasses.replace(cfg, **repl))


def make_sharded_step(runtime: SlamRuntime, mesh: Mesh, axis: str = "p"):
    """The full frame step jitted with P row-sharded over ``mesh``."""
    runtime = _sharded_runtime(runtime)
    sh = state_shardings(mesh, axis)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        runtime.step,
        in_shardings=(sh, rep),
        out_shardings=(sh, rep),
    )


def make_sharded_init(runtime: SlamRuntime, mesh: Mesh, axis: str = "p"):
    runtime = _sharded_runtime(runtime)
    sh = state_shardings(mesh, axis)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        runtime.init_step,
        in_shardings=(sh, rep),
        out_shardings=sh,
    )


# ---------------------------------------------------------------------------
# 2-D (row x column) covariance sharding
# ---------------------------------------------------------------------------
#
# The 1-D row sharding's communication floor is the replicated Kalman
# factor: every device's row block of the downdate P -= K^T (H P) needs
# ALL columns of the (2F, N) factor, so the all-gather moves ~2F*N bytes
# per device regardless of the device count.  Tiling P over a (p, q)
# mesh instead gives each device an (N/p, N/q) block: it needs only the
# (2F, N/q) column slice of the factor and the (N/p, 2F) row slice of
# K^T -- per-device gather traffic drops by ~q, which is the sqrt(D)
# scaling BASELINE.md's efficiency model calls for at pod scale.
# Everything else in the step already partitions on both axes: the
# placement helpers (filter/shardable.py) are elementwise selects, the
# strips are one-hot contractions, and x/metadata stay replicated.


def make_mesh_2d(devices=None, shape: tuple = (2, 4),
                 axes: tuple = ("p", "q")) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    arr = np.asarray(devices[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, axes)


def state_shardings_2d(mesh: Mesh, axes: tuple = ("p", "q")) -> SlamState:
    """P tiled (rows x cols) over the 2-D mesh; everything else
    replicated."""
    rep = NamedSharding(mesh, P())
    return SlamState(
        x=rep,
        P=NamedSharding(mesh, P(axes[0], axes[1])),
        active=rep,
        is_xyz=rep,
        times_predicted=rep,
        times_matched=rep,
        descriptors=rep,
        patch_pose=rep,
        birth=rep,
        rng=rep,
        frame=rep,
    )


def shard_state_2d(state: SlamState, mesh: Mesh,
                   axes: tuple = ("p", "q")) -> SlamState:
    return jax.tree.map(jax.device_put, state, state_shardings_2d(mesh, axes))


def make_sharded_step_2d(runtime: SlamRuntime, mesh: Mesh,
                         axes: tuple = ("p", "q")):
    runtime = _sharded_runtime(runtime)
    sh = state_shardings_2d(mesh, axes)
    rep = NamedSharding(mesh, P())
    return jax.jit(runtime.step, in_shardings=(sh, rep),
                   out_shardings=(sh, rep))


def make_sharded_init_2d(runtime: SlamRuntime, mesh: Mesh,
                         axes: tuple = ("p", "q")):
    runtime = _sharded_runtime(runtime)
    sh = state_shardings_2d(mesh, axes)
    rep = NamedSharding(mesh, P())
    return jax.jit(runtime.init_step, in_shardings=(sh, rep),
                   out_shardings=sh)
