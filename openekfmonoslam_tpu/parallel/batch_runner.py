"""Multi-sequence data parallelism: many SLAM streams per chip / mesh.

No reference counterpart (single-threaded C++, SURVEY.md section 2.7).
Production serving runs one filter per camera stream; on TPU the streams
are batched: `vmap` of the full frame step over a leading batch axis turns
every per-frame op into a batched op (the (N, N) covariance work becomes
(B, N, N) -- deeper MXU utilization and amortized per-op overhead), and the
batch axis is sharded over the device mesh so each chip owns B/n
independent streams.  Scaling is embarrassingly parallel -- there is no
cross-stream communication, so XLA inserts no collectives and efficiency
is ~100% minus load imbalance.

Combine with parallel/sharding.py (P row-sharded single stream) for the
two orthogonal axes: 'd' data-parallel over streams, 'p' model-parallel
over the map covariance of one big-map stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.filter import features as feat_mod
from openekfmonoslam_tpu.filter.state import SlamState


def make_batch_states(runtime: SlamRuntime, batch: int,
                      seeds=None) -> SlamState:
    """A batched SlamState pytree: every leaf gains a leading (B,) axis."""
    base = runtime.make_initial_state()
    states = jax.tree.map(
        lambda leaf: jnp.broadcast_to(leaf, (batch,) + leaf.shape).copy(),
        base)
    if seeds is not None:
        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
        states = states._replace(rng=keys)
    return states


def batch_shardings(mesh: Mesh, axis: str = "d"):
    """Sharding for the batched state/frames: batch axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def make_batched_init(runtime: SlamRuntime, mesh: Mesh | None = None,
                      axis: str = "d"):
    f = jax.vmap(runtime.init_step)
    if mesh is None:
        return jax.jit(f)
    sh = NamedSharding(mesh, P(axis))
    return jax.jit(f, in_shardings=(sh, sh), out_shardings=sh)


def batched_step(runtime: SlamRuntime, states: SlamState,
                 grays: jnp.ndarray):
    """The frame step over a leading (B,) stream axis, rare paths gated at
    BATCH level.

    ``jax.vmap(runtime.step)`` degrades every per-stream ``lax.cond`` to
    executing BOTH branches under a batched predicate, so the batched
    program re-pays the rare-path work (second detection + zone balance,
    feature-addition covariance growth, conversion P surgery) on EVERY
    frame for EVERY stream -- measured as the round-3 stream-DP ceiling
    (aggregate 1.1-1.4x a single stream, BASELINE.md).  Here the dense
    phases are vmapped as-is and each rare path sits behind ONE
    ``lax.cond`` on the batch-reduced trigger: it runs (masked per
    stream) only when ANY stream needs it.  Per-stream results are
    bit-exact to vmap(step): a masked rare path applies
    ``where(False, new, old)`` pass-throughs, and a skipped one is
    skipped for every stream exactly when no stream triggers
    (tests/test_batch_runner.py locks the equality).
    """
    rt = runtime
    cfg = rt.config
    ekf = cfg.ekf
    C = cfg.max_features

    with jax.default_matmul_precision(cfg.matmul_precision):
        states, pred = jax.vmap(rt.phase_predict)(states)
        m, aux, in_ellipse = jax.vmap(rt.phase_match)(states, pred, grays)
        res = jax.vmap(rt.phase_ransac)(states, pred, m)
        states = jax.vmap(rt.phase_update_li)(states, pred, m, res.inliers)
        pred2, rescued = jax.vmap(rt.phase_rescue)(states, m, res.outliers)
        states = jax.vmap(rt.phase_update_hi)(states, pred2, m, rescued)
        inliers_all = res.inliers | rescued

        states, do_mm, needed = jax.vmap(rt.mapman_maintain)(
            states, pred, m, inliers_all)

        # conversion: cheap eligibility scan per stream, P surgery only
        # when any stream converts (masked per stream inside)
        from openekfmonoslam_tpu.filter import mapman
        thr = ekf.inverse_depth_linearity_index_threshold
        conv, slots_c = jax.vmap(
            lambda st: mapman.conversion_candidate(
                st, thr, order_key=st.birth if rt.quirks else None))(states)
        conv = conv & do_mm
        states = jax.lax.cond(
            jnp.any(conv),
            lambda ss: jax.vmap(
                lambda st, sl, en: mapman._convert_slot(st, sl, enable=en)
            )(ss, slots_c, conv),
            lambda ss: ss, states)

        # detection + addition: only when any stream fell short
        flags = do_mm & (needed > 0)
        desc_shape = (C,) + states.descriptors.shape[2:]

        def _detect_all(_):
            uv, desc, valid = jax.vmap(rt.detect_candidates)(
                states, pred, aux, in_ellipse, needed)
            return uv, desc, valid & flags[:, None]

        def _no_detect(_):
            B = grays.shape[0]
            return (jnp.zeros((B, C, 2), jnp.float32),
                    jnp.zeros((B,) + desc_shape, states.descriptors.dtype),
                    jnp.zeros((B, C), bool))

        cand_uv, cand_desc, cand_valid = jax.lax.cond(
            jnp.any(flags), _detect_all, _no_detect, None)
        new_slot, new_ok = jax.vmap(feat_mod.assign_slots)(
            states.active, cand_valid)
        states = jax.lax.cond(
            jnp.any(new_ok),
            lambda ss: jax.vmap(
                lambda st, uv, de, sl, ok: feat_mod._add_features_impl(
                    st, rt.camera, cfg, uv.astype(rt.dtype), de, sl, ok)
            )(ss, cand_uv, cand_desc, new_slot, new_ok),
            lambda ss: ss, states)

        # Streams that did NOT trigger detection must not leak the
        # speculatively detected candidate positions into their records:
        # vmap(step) produces zeros for them (its per-stream cond skips
        # detection), so zero cand_uv where flags is False to keep the
        # bit-exact-to-vmap(step) contract for records.new_uv as well.
        rec_uv = jnp.where(flags[:, None, None], cand_uv, 0.0)
        records = jax.vmap(rt.make_record)(
            states, pred, m, res, rescued,
            rec_uv.astype(rt.dtype), new_ok, new_slot)
        return states, records


def make_batched_step(runtime: SlamRuntime, mesh: Mesh | None = None,
                      axis: str = "d"):
    def f(states, grays):
        return batched_step(runtime, states, grays)

    if mesh is None:
        return jax.jit(f)
    sh = NamedSharding(mesh, P(axis))
    return jax.jit(f, in_shardings=(sh, sh), out_shardings=(sh, sh))


def batch_state_shardings_2d(mesh: Mesh, d_axis: str = "d",
                             p_axis: str = "p") -> SlamState:
    """Shardings for the combined layout: stream batch over ``d_axis``,
    each stream's covariance block-row sharded over ``p_axis`` -- the full
    production mesh (multihost.make_host_mesh: 'd' across hosts over DCN,
    'p' inside each host's ICI domain).

    P is (B, N, N) -> P(d, p, None); x is (B, N) -> P(d); small metadata
    replicated within the stream's 'p' group.
    """
    d = P(d_axis)
    return SlamState(
        x=NamedSharding(mesh, d),
        P=NamedSharding(mesh, P(d_axis, p_axis)),
        active=NamedSharding(mesh, d),
        is_xyz=NamedSharding(mesh, d),
        times_predicted=NamedSharding(mesh, d),
        times_matched=NamedSharding(mesh, d),
        descriptors=NamedSharding(mesh, d),
        patch_pose=NamedSharding(mesh, d),
        birth=NamedSharding(mesh, d),
        rng=NamedSharding(mesh, d),
        frame=NamedSharding(mesh, d),
    )


def make_batched_step_2d(runtime: SlamRuntime, mesh: Mesh,
                         d_axis: str = "d", p_axis: str = "p"):
    """vmapped step jitted with the 2-axis (stream x covariance) layout."""
    sh_state = batch_state_shardings_2d(mesh, d_axis, p_axis)
    sh_frames = NamedSharding(mesh, P(d_axis))

    def f(states, grays):
        return batched_step(runtime, states, grays)

    return jax.jit(f, in_shardings=(sh_state, sh_frames),
                   out_shardings=(sh_state, NamedSharding(mesh, P(d_axis))))


def scan_batched_sequences(runtime: SlamRuntime, states: SlamState,
                           frames: jnp.ndarray,
                           mesh: Mesh | None = None, axis: str = "d"):
    """Device-resident run of B sequences: lax.scan over time of the
    vmapped step.  ``frames`` is (B, T, H, W); returns (final states,
    stacked per-frame records with leading (T, B) axes)."""
    def body(carry, frame_t):
        s, rec = batched_step(runtime, carry, frame_t)
        return s, rec

    frames_tb = jnp.swapaxes(frames, 0, 1)          # (T, B, H, W)

    def run(states, frames_tb):
        return jax.lax.scan(body, states, frames_tb)

    if mesh is None:
        return jax.jit(run)(states, frames_tb)
    sh = NamedSharding(mesh, P(axis))
    sh_frames = NamedSharding(mesh, P(None, axis))  # records: (T, B, ...)
    runj = jax.jit(run, in_shardings=(sh, sh_frames),
                   out_shardings=(sh, sh_frames))
    states = jax.device_put(states, sh)
    frames_tb = jax.device_put(frames_tb, sh_frames)
    return runj(states, frames_tb)
