"""Keyframe pose graph: drift correction for long sequences.

The reference is a pure EKF: its only answer to filter divergence is a
full map reset (resetEKFMap, MapManagement.cpp:263-275, wired but disabled
at EKF.cpp:587-588), and long-run drift is unbounded.  The TPU build adds
the missing layer (SURVEY.md section 7.1, step 10): camera poses are
periodically snapshotted as *keyframes*, consecutive keyframes are linked
by relative-pose edges measured from the filter (with information from the
filter covariance), relocalization events add *loop-closure* edges, and a
Gauss-Newton pass over the graph redistributes accumulated drift.

TPU-first design:
  * static shapes -- fixed keyframe/edge capacity with active masks; adding
    nodes/edges is a masked write, never a reshape;
  * batched residuals/Jacobians -- all edges evaluated by one vmap;
  * the normal system is assembled with scatter-adds into a dense
    (6K, 6K) matrix and solved with Cholesky -- K <= a few hundred
    keyframes, so the solve is a single small MXU-friendly op;
  * state is a pytree; `optimize` is jittable end-to-end (lax.fori_loop
    over Gauss-Newton iterations).

Parametrization: nodes are (r in R^3, q in R^4) world poses; the residual
of edge (i -> j) with measurement (dr, dq) is the 6-vector
[R(q_i)^T (r_j - r_i) - dr ; 2 * vec(dq^-1 * (q_i^-1 q_j))], the standard
right-multiplicative local error.  Updates apply local perturbations
(delta_r in world, delta_theta as a small rotation composed on the right).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openekfmonoslam_tpu.core import quaternion as quat


class PoseGraph(NamedTuple):
    node_r: jnp.ndarray       # (K, 3) world positions
    node_q: jnp.ndarray       # (K, 4) world orientations (w, x, y, z)
    node_active: jnp.ndarray  # (K,) bool
    n_nodes: jnp.ndarray      # () int32
    edge_ij: jnp.ndarray      # (E, 2) int32 node indices (i -> j)
    edge_dr: jnp.ndarray      # (E, 3) measured relative translation (in i)
    edge_dq: jnp.ndarray      # (E, 4) measured relative rotation
    edge_info: jnp.ndarray    # (E, 6, 6) information matrix
    edge_active: jnp.ndarray  # (E,) bool
    n_edges: jnp.ndarray      # () int32

    @property
    def capacity(self) -> tuple[int, int]:
        return self.node_r.shape[0], self.edge_ij.shape[0]


def make_pose_graph(max_nodes: int = 256, max_edges: int = 512,
                    dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        node_r=jnp.zeros((max_nodes, 3), dtype),
        node_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (max_nodes, 1)),
        node_active=jnp.zeros((max_nodes,), bool),
        n_nodes=jnp.int32(0),
        edge_ij=jnp.zeros((max_edges, 2), jnp.int32),
        edge_dr=jnp.zeros((max_edges, 3), dtype),
        edge_dq=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype),
                         (max_edges, 1)),
        edge_info=jnp.zeros((max_edges, 6, 6), dtype),
        edge_active=jnp.zeros((max_edges,), bool),
        n_edges=jnp.int32(0),
    )


def _qconj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def relative_pose(r_i, q_i, r_j, q_j):
    """Relative pose of j in i's frame: (dr, dq)."""
    Ri_t = quat.to_rotation_matrix(_qconj(q_i))
    dr = Ri_t @ (r_j - r_i)
    dq = quat.multiply(_qconj(q_i), q_j)
    return dr, dq


def add_keyframe(graph: PoseGraph, r: jnp.ndarray, q: jnp.ndarray,
                 info: jnp.ndarray | None = None) -> PoseGraph:
    """Append a keyframe; link it to the previous one with an odometry edge
    whose measurement is the current filter-relative pose.

    ``info`` is the (6, 6) information (inverse covariance) of the relative
    measurement; identity if omitted.  No-op (masked) when capacity is
    full.
    """
    kmax, emax = graph.capacity
    dtype = graph.node_r.dtype
    k = graph.n_nodes
    can_add = k < kmax
    idx = jnp.clip(k, 0, kmax - 1)

    g = graph._replace(
        node_r=graph.node_r.at[idx].set(
            jnp.where(can_add, r.astype(dtype), graph.node_r[idx])),
        node_q=graph.node_q.at[idx].set(
            jnp.where(can_add, q.astype(dtype), graph.node_q[idx])),
        node_active=graph.node_active.at[idx].set(
            graph.node_active[idx] | can_add),
        n_nodes=k + can_add.astype(jnp.int32),
    )

    # odometry edge from the previous keyframe
    has_prev = k > 0
    pidx = jnp.clip(k - 1, 0, kmax - 1)
    dr, dq = relative_pose(g.node_r[pidx], g.node_q[pidx], r.astype(dtype),
                           q.astype(dtype))
    inf = (jnp.eye(6, dtype=dtype) if info is None
           else info.astype(dtype))
    return _append_edge(g, pidx, idx, dr, dq, inf,
                        enable=can_add & has_prev)


def add_loop_edge(graph: PoseGraph, i: jnp.ndarray, j: jnp.ndarray,
                  dr: jnp.ndarray, dq: jnp.ndarray,
                  info: jnp.ndarray | None = None) -> PoseGraph:
    """Add a loop-closure edge i -> j with measured relative pose.

    This is the hook the relocalization path calls when the current camera
    re-observes a past keyframe's scene.  Closure information may be
    orders of magnitude stiffer than the odometry edges (PnP info under
    unit pixel noise reaches ~1e7 vs the velocity-walk odometry's
    ~1e3-1e4); optimize()'s scale-aware damping handles that span -- do
    NOT rescale closures below the odometry stiffness, or the graph stops
    moving (measured: a trace cap at 1e3x identity cut a 92% endpoint
    correction to 10%).
    """
    dtype = graph.node_r.dtype
    inf = (jnp.eye(6, dtype=dtype) if info is None
           else info.astype(dtype))
    return _append_edge(graph, jnp.int32(i), jnp.int32(j),
                        dr.astype(graph.node_r.dtype),
                        dq.astype(graph.node_r.dtype), inf,
                        enable=jnp.bool_(True))


def _append_edge(graph: PoseGraph, i, j, dr, dq, info, enable) -> PoseGraph:
    _, emax = graph.capacity
    e = graph.n_edges
    ok = enable & (e < emax)
    eidx = jnp.clip(e, 0, emax - 1)
    sel = ok.astype(graph.node_r.dtype)
    return graph._replace(
        edge_ij=graph.edge_ij.at[eidx].set(
            jnp.where(ok, jnp.stack([jnp.int32(i), jnp.int32(j)]),
                      graph.edge_ij[eidx])),
        edge_dr=graph.edge_dr.at[eidx].set(
            sel * dr + (1 - sel) * graph.edge_dr[eidx]),
        edge_dq=graph.edge_dq.at[eidx].set(
            sel * dq + (1 - sel) * graph.edge_dq[eidx]),
        edge_info=graph.edge_info.at[eidx].set(
            sel * info + (1 - sel) * graph.edge_info[eidx]),
        edge_active=graph.edge_active.at[eidx].set(
            graph.edge_active[eidx] | ok),
        n_edges=e + ok.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Gauss-Newton optimization
# ---------------------------------------------------------------------------


def _edge_residual(r_i, q_i, r_j, q_j, dr, dq):
    """6-vector residual of one edge (translation in i's frame; rotation as
    2x the vector part of the error quaternion)."""
    pr, pq = relative_pose(r_i, q_i, r_j, q_j)
    err_q = quat.multiply(_qconj(dq), pq)
    # keep the scalar part positive so the small-angle map is continuous
    err_q = err_q * jnp.sign(err_q[0] + 1e-30)
    return jnp.concatenate([pr - dr, 2.0 * err_q[1:4]])


def _apply_delta(node_r, node_q, delta):
    """Apply per-node local perturbations [dr_world, dtheta_right]."""
    dr = delta[:, 0:3]
    dth = delta[:, 3:6]
    dq = jnp.concatenate([
        jnp.ones((delta.shape[0], 1), delta.dtype), 0.5 * dth], axis=1)
    q_new = jax.vmap(quat.multiply)(node_q, dq)
    q_new = q_new / jnp.linalg.norm(q_new, axis=1, keepdims=True)
    return node_r + dr, q_new


def optimize(graph: PoseGraph, iterations: int = 40,
             damping: float = 1e-6) -> PoseGraph:
    """Jittable batched Gauss-Newton over all active nodes/edges.

    Node 0 is gauged (fixed).  Residual Jacobians come from jax.jacfwd of
    the edge residual w.r.t. the 12-dim local perturbation of its two
    endpoints -- one vmap over edges; the (6K, 6K) normal system is
    scatter-assembled and solved densely (K is the keyframe count, a few
    hundred at most).
    """
    kmax, emax = graph.capacity
    dtype = graph.node_r.dtype
    n6 = 6 * kmax

    ij = graph.edge_ij
    w_edge = graph.edge_active.astype(dtype)

    def residual_of(delta12, r_i, q_i, r_j, q_j, dr, dq):
        ri2, qi2 = _apply_delta(r_i[None], q_i[None], delta12[None, 0:6])
        rj2, qj2 = _apply_delta(r_j[None], q_j[None], delta12[None, 6:12])
        return _edge_residual(ri2[0], qi2[0], rj2[0], qj2[0], dr, dq)

    def gn_step(_, carry):
        node_r, node_q = carry
        r_i = node_r[ij[:, 0]]
        q_i = node_q[ij[:, 0]]
        r_j = node_r[ij[:, 1]]
        q_j = node_q[ij[:, 1]]

        zero12 = jnp.zeros((emax, 12), dtype)
        res = jax.vmap(residual_of)(zero12, r_i, q_i, r_j, q_j,
                                    graph.edge_dr, graph.edge_dq)
        J = jax.vmap(jax.jacfwd(residual_of))(zero12, r_i, q_i, r_j, q_j,
                                              graph.edge_dr, graph.edge_dq)
        res = res * w_edge[:, None]
        J = J * w_edge[:, None, None]                   # (E, 6, 12)

        Ji = J[:, :, 0:6]
        Jj = J[:, :, 6:12]
        info = graph.edge_info                           # (E, 6, 6)
        JiT_W = jnp.einsum("eri,erc->eic", Ji, info)     # (E, 6, 6)
        JjT_W = jnp.einsum("eri,erc->eic", Jj, info)

        Hii = JiT_W @ Ji                                 # (E, 6, 6)
        Hij = JiT_W @ Jj
        Hji = JjT_W @ Ji
        Hjj = JjT_W @ Jj
        bi = jnp.einsum("eic,ec->ei", JiT_W, res)
        bj = jnp.einsum("eic,ec->ei", JjT_W, res)

        H = jnp.zeros((kmax, kmax, 6, 6), dtype)
        H = H.at[ij[:, 0], ij[:, 0]].add(Hii)
        H = H.at[ij[:, 0], ij[:, 1]].add(Hij)
        H = H.at[ij[:, 1], ij[:, 0]].add(Hji)
        H = H.at[ij[:, 1], ij[:, 1]].add(Hjj)
        b = jnp.zeros((kmax, 6), dtype)
        b = b.at[ij[:, 0]].add(bi)
        b = b.at[ij[:, 1]].add(bj)

        Hd = H.transpose(0, 2, 1, 3).reshape(n6, n6)
        bd = b.reshape(n6)

        # gauge: fix node 0; regularize inactive nodes so Hd stays SPD
        free = jnp.repeat(
            graph.node_active & (jnp.arange(kmax) != 0), 6).astype(dtype)
        Hd = Hd * free[:, None] * free[None, :]
        # SCALE-AWARE damping: PnP information matrices carry ~1e6-1e8
        # entries, so an absolute 1e-6 ridge is ~1e-13 relative -- a
        # nearly-unconstrained direction (e.g. a sparse closure set) then
        # drives the f32 solve to NaN (observed on a 3-closure round-4
        # artifact run).  Damp relative to the mean active diagonal, LM
        # style, which is also what keeps the step scale-invariant to a
        # global info rescale.
        diag = jnp.diagonal(Hd)
        scale = (jnp.sum(diag * free)
                 / jnp.maximum(jnp.sum(free), 1.0))
        lam = damping * jnp.maximum(scale, 1.0)
        Hd = Hd + jnp.diag(jnp.where(free > 0, lam, 1.0))
        delta = -jnp.linalg.solve(Hd, bd * free).reshape(kmax, 6)
        delta = delta * free.reshape(kmax, 6)
        # a diverged solve must not poison the trajectory: fall back to
        # no-update for non-finite steps
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

        # TRUST-REGION step clamp: with stiff loop-closure edges (PnP
        # info ~1e7) against soft odometry and real rotations, a full
        # Gauss-Newton step overshoots the linearization and the
        # iteration diverges (measured 300x the raw error on a 3-closure
        # out-and-back graph).  Clamping each node's step to 0.3 rad and
        # a graph-scale translation turns the loop into a damped descent
        # that converges in the extra iterations.
        span = jnp.max(jnp.linalg.norm(
            node_r - node_r[0][None], axis=-1) * graph.node_active)
        t_cap = jnp.maximum(0.25 * span, 1e-3)
        tn = jnp.linalg.norm(delta[:, 0:3], axis=-1)
        rn = jnp.linalg.norm(delta[:, 3:6], axis=-1)
        s = jnp.minimum(jnp.minimum(1.0, t_cap / jnp.maximum(tn, 1e-12)),
                        0.3 / jnp.maximum(rn, 1e-12))
        delta = delta * s[:, None]

        return _apply_delta(node_r, node_q, delta)

    node_r, node_q = jax.lax.fori_loop(
        0, iterations, gn_step, (graph.node_r, graph.node_q))
    return graph._replace(node_r=node_r, node_q=node_q)


def total_error(graph: PoseGraph) -> jnp.ndarray:
    """Sum of information-weighted squared edge residuals (diagnostic)."""
    ij = graph.edge_ij

    def one(e):
        res = _edge_residual(graph.node_r[ij[e, 0]], graph.node_q[ij[e, 0]],
                             graph.node_r[ij[e, 1]], graph.node_q[ij[e, 1]],
                             graph.edge_dr[e], graph.edge_dq[e])
        return res @ graph.edge_info[e] @ res

    errs = jax.vmap(one)(jnp.arange(graph.capacity[1]))
    return jnp.sum(errs * graph.edge_active)
