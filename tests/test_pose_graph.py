"""Pose-graph layer tests: residual correctness, keyframe/edge bookkeeping,
and Gauss-Newton drift redistribution with a loop closure."""

import jax
import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.core import quaternion as quat
from openekfmonoslam_tpu.graph import (add_keyframe, add_loop_edge,
                                       make_pose_graph, optimize,
                                       relative_pose)
from openekfmonoslam_tpu.graph.pose_graph import total_error


def qz(angle):
    """Quaternion for rotation about +z."""
    return jnp.asarray([np.cos(angle / 2), 0.0, 0.0, np.sin(angle / 2)])


class TestRelativePose:
    def test_identity(self):
        r = jnp.asarray([1.0, 2.0, 3.0])
        q = qz(0.3)
        dr, dq = relative_pose(r, q, r, q)
        assert np.allclose(dr, 0, atol=1e-6)
        assert np.allclose(np.abs(dq[0]), 1, atol=1e-6)

    def test_translation_in_local_frame(self):
        q = qz(np.pi / 2)   # frame i rotated 90deg about z
        r_i = jnp.zeros(3)
        r_j = jnp.asarray([1.0, 0.0, 0.0])
        dr, _ = relative_pose(r_i, q, r_j, q)
        # world +x expressed in a frame rotated +90deg about z is -y
        assert np.allclose(dr, [0.0, -1.0, 0.0], atol=1e-6)


class TestBookkeeping:
    def test_keyframes_and_odometry_edges(self):
        g = make_pose_graph(max_nodes=8, max_edges=8)
        g = add_keyframe(g, jnp.zeros(3), qz(0.0))
        g = add_keyframe(g, jnp.asarray([1.0, 0, 0]), qz(0.1))
        g = add_keyframe(g, jnp.asarray([2.0, 0, 0]), qz(0.2))
        assert int(g.n_nodes) == 3
        assert int(g.n_edges) == 2          # first keyframe has no edge
        assert g.edge_ij[:2].tolist() == [[0, 1], [1, 2]]
        # measured dr of edge 0 is the relative pose at insertion
        assert np.allclose(g.edge_dr[0], [1.0, 0, 0], atol=1e-6)

    def test_capacity_is_masked_noop(self):
        g = make_pose_graph(max_nodes=2, max_edges=1)
        for i in range(4):
            g = add_keyframe(g, jnp.asarray([float(i), 0, 0]), qz(0.0))
        assert int(g.n_nodes) == 2
        assert int(g.n_edges) == 1
        assert np.isfinite(np.asarray(g.node_r)).all()


class TestOptimize:
    def test_perfect_graph_unchanged(self):
        g = make_pose_graph(max_nodes=8, max_edges=8)
        poses = [(jnp.asarray([float(i), 0, 0]), qz(0.1 * i))
                 for i in range(4)]
        for r, q in poses:
            g = add_keyframe(g, r, q)
        e0 = float(total_error(g))
        g2 = jax.jit(lambda gr: optimize(gr, iterations=3))(g)
        assert e0 < 1e-10
        for i, (r, q) in enumerate(poses):
            assert np.allclose(g2.node_r[i], r, atol=1e-4)

    def test_loop_closure_redistributes_drift(self):
        """Square loop: odometry edges measure perfect 1m legs with 90deg
        turns, but the inserted node poses carry accumulated drift.  A
        loop-closure edge back to node 0 + optimization must pull the
        final pose toward closing the square."""
        g = make_pose_graph(max_nodes=8, max_edges=16, dtype=jnp.float64)

        # true poses: corners of a unit square, heading turns 90deg each
        true = []
        r = np.zeros(3)
        ang = 0.0
        for leg in range(5):
            true.append((r.copy(), ang))
            heading = np.array([np.cos(ang), np.sin(ang), 0.0])
            r = r + heading
            ang += np.pi / 2

        # drifted estimates: each leg slightly longer and over-rotated
        drift_r = np.zeros(3)
        drift_ang = 0.0
        est = []
        for leg in range(5):
            est.append((drift_r.copy(), drift_ang))
            heading = np.array([np.cos(drift_ang), np.sin(drift_ang), 0.0])
            drift_r = drift_r + 1.06 * heading
            drift_ang += np.pi / 2 + 0.03

        # build graph from drifted poses, then overwrite edge measurements
        # with the TRUE relative motion (what odometry 'should' have seen)
        for r_e, a_e in est:
            g = add_keyframe(g, jnp.asarray(r_e), qz(a_e))
        for e in range(4):
            (r_a, a_a), (r_b, a_b) = true[e], true[e + 1]
            dr, dq = relative_pose(jnp.asarray(r_a), qz(a_a),
                                   jnp.asarray(r_b), qz(a_b))
            g = g._replace(edge_dr=g.edge_dr.at[e].set(dr),
                           edge_dq=g.edge_dq.at[e].set(dq))

        # loop closure: node 4 truly coincides with node 0
        dr, dq = relative_pose(jnp.asarray(true[4][0]), qz(true[4][1]),
                               jnp.asarray(true[0][0]), qz(true[0][1]))
        g = add_loop_edge(g, 4, 0, dr, dq,
                          info=10.0 * jnp.eye(6, dtype=jnp.float64))

        end_err_before = float(jnp.linalg.norm(g.node_r[4] - true[4][0]))
        e_before = float(total_error(g))
        g2 = optimize(g, iterations=15)
        e_after = float(total_error(g2))
        end_err_after = float(jnp.linalg.norm(g2.node_r[4]
                                              - jnp.asarray(true[4][0])))

        assert e_after < e_before * 1e-2
        assert end_err_after < end_err_before * 0.2
        # gauge held: node 0 pinned at origin
        assert np.allclose(g2.node_r[0], 0.0, atol=1e-9)

    def test_jit_and_masked_capacity(self):
        """optimize() must be jittable and ignore inactive node/edge slots."""
        g = make_pose_graph(max_nodes=16, max_edges=16)
        g = add_keyframe(g, jnp.zeros(3), qz(0.0))
        g = add_keyframe(g, jnp.asarray([1.0, 0, 0]), qz(0.0))
        g2 = jax.jit(lambda gr: optimize(gr, iterations=2))(g)
        assert np.isfinite(np.asarray(g2.node_r)).all()
        assert np.isfinite(np.asarray(g2.node_q)).all()
        # inactive slots untouched (identity quats)
        assert np.allclose(g2.node_q[5], [1, 0, 0, 0], atol=1e-9)


class TestEngineIntegration:
    def test_engine_collects_keyframes(self, rng):
        """SlamEngine with keyframe_every maintains the graph during a run
        and can optimize it."""
        import jax.numpy as jnp
        from openekfmonoslam_tpu.config import SlamConfig
        from openekfmonoslam_tpu.engine.engine import SlamEngine
        from openekfmonoslam_tpu.vision import brief

        cfg = SlamConfig(max_features=12, max_keypoints=64,
                         max_hypotheses=12)
        eng = SlamEngine(cfg, keyframe_every=2, keyframe_capacity=16)
        big = np.kron(rng.integers(0, 255, (40, 44)),
                      np.ones((4, 4))).astype(np.float32)
        big = np.asarray(brief.smooth(jnp.asarray(big), 1.0))
        eng.init(big[20:140, 20:148])
        for i in range(1, 7):
            eng.step(big[20:140, 20 + i:148 + i])
        assert int(eng.pose_graph.n_nodes) == 3      # frames 2, 4, 6
        assert int(eng.pose_graph.n_edges) == 2
        kf = eng.optimize_pose_graph(iterations=2)
        assert kf.shape == (3, 3)
        assert np.isfinite(kf).all()

    def test_pose_graph_checkpoint_roundtrip(self, rng, tmp_path):
        from openekfmonoslam_tpu.engine.checkpoint import (load_pose_graph,
                                                           save_pose_graph)
        g = make_pose_graph(max_nodes=8, max_edges=8)
        g = add_keyframe(g, jnp.zeros(3), qz(0.0))
        g = add_keyframe(g, jnp.asarray([1.0, 0, 0]), qz(0.2))
        p = str(tmp_path / "graph.npz")
        save_pose_graph(p, g)
        g2 = load_pose_graph(p)
        for f in g._fields:
            np.testing.assert_array_equal(np.asarray(getattr(g, f)),
                                          np.asarray(getattr(g2, f)))
