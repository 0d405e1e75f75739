"""Multi-sequence data parallelism tests on the virtual 8-device CPU mesh:
batched step correctness vs single-stream, mesh-sharded execution, and
independence of streams."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.config import SlamConfig
from openekfmonoslam_tpu.engine.step import SlamRuntime
from openekfmonoslam_tpu.parallel.batch_runner import (
    make_batch_states,
    make_batched_init,
    make_batched_step,
    scan_batched_sequences,
)
from openekfmonoslam_tpu.parallel.sharding import make_mesh
from openekfmonoslam_tpu.vision import brief


@pytest.fixture(scope="module")
def rt():
    cfg = SlamConfig(max_features=12, max_keypoints=64, max_hypotheses=12)
    return SlamRuntime(cfg)


def make_frames(rng, b, t, h=120, w=128):
    """B independent synthetic translation sequences."""
    out = np.zeros((b, t, h, w), np.float32)
    for i in range(b):
        big = np.kron(rng.integers(0, 255, (40, 44)),
                      np.ones((4, 4))).astype(np.float32)
        big = np.asarray(brief.smooth(jnp.asarray(big), 1.0))
        for j in range(t):
            out[i, j] = big[20:20 + h, 20 + j:20 + j + w]
    return jnp.asarray(out)


class TestBatchedStep:
    def test_matches_single_stream(self, rt, rng):
        frames = make_frames(rng, 2, 3)
        states = make_batch_states(rt, 2)
        init_b = make_batched_init(rt)
        step_b = make_batched_step(rt)
        states = init_b(states, frames[:, 0])
        states, rec = step_b(states, frames[:, 1])

        # stream 0 alone must produce the same result
        s0 = rt.make_initial_state()
        s0 = jax.jit(rt.init_step)(s0, frames[0, 0])
        s0, rec0 = jax.jit(rt.step)(s0, frames[0, 1])
        np.testing.assert_allclose(np.asarray(states.x[0]),
                                   np.asarray(s0.x), rtol=2e-5, atol=1e-6)
        assert int(rec.total_matches[0]) == int(rec0.total_matches)

    def test_streams_independent(self, rt, rng):
        """Changing stream 1's frames must not affect stream 0."""
        frames = make_frames(rng, 2, 3)
        frames_b = frames.at[1].set(frames[1, :, ::-1])
        init_b = make_batched_init(rt)
        step_b = make_batched_step(rt)
        sa = init_b(make_batch_states(rt, 2), frames[:, 0])
        sb = init_b(make_batch_states(rt, 2), frames_b[:, 0])
        sa, _ = step_b(sa, frames[:, 1])
        sb, _ = step_b(sb, frames_b[:, 1])
        np.testing.assert_array_equal(np.asarray(sa.x[0]),
                                      np.asarray(sb.x[0]))


class TestMeshSharded:
    def test_scan_on_8device_mesh(self, rt, rng):
        mesh = make_mesh(jax.devices(), axis="d")
        b, t = 8, 4
        frames = make_frames(rng, b, t)
        states = make_batch_states(rt, b)
        init_b = make_batched_init(rt, mesh, "d")
        states = init_b(states, frames[:, 0])
        states, recs = scan_batched_sequences(rt, states, frames[:, 1:],
                                              mesh, "d")
        assert recs.total_matches.shape == (t - 1, b)
        assert np.isfinite(np.asarray(states.x)).all()
        # every stream tracked something
        assert (np.asarray(recs.total_matches)[-1] > 0).all()
        # the batched state really is sharded over the mesh
        shard_devs = {d for s in states.x.addressable_shards
                      for d in [s.device]}
        assert len(shard_devs) == 8


class TestTwoAxisMesh:
    def test_streams_x_covariance_sharding(self, rt, rng):
        """The full production layout on a (2, 4) virtual mesh: 2 streams
        data-parallel, each stream's P block-row sharded over 4 devices."""
        from jax.sharding import Mesh
        from openekfmonoslam_tpu.parallel.batch_runner import (
            batch_state_shardings_2d, make_batched_step_2d)

        devs = np.asarray(jax.devices()).reshape(2, 4)
        mesh = Mesh(devs, ("d", "p"))
        b = 2
        frames = make_frames(rng, b, 3)
        states = make_batch_states(rt, b)
        sh = batch_state_shardings_2d(mesh)
        states = jax.device_put(states, sh)
        init_b = jax.jit(jax.vmap(rt.init_step), in_shardings=(
            sh, jax.sharding.NamedSharding(mesh,
                                           jax.sharding.PartitionSpec("d"))),
            out_shardings=sh)
        states = init_b(states, frames[:, 0])
        step2d = make_batched_step_2d(rt, mesh)
        states, rec = step2d(states, frames[:, 1])
        states, rec = step2d(states, frames[:, 2])
        assert np.isfinite(np.asarray(states.x)).all()
        assert (np.asarray(rec.total_matches) > 0).all()
        # P really spans all 8 devices
        devs_used = {s.device for s in states.P.addressable_shards}
        assert len(devs_used) == 8


class TestMultihostHelpers:
    def test_single_process_fallback(self):
        from openekfmonoslam_tpu.parallel import multihost
        assert multihost.initialize() is False          # single process
        mesh = multihost.make_host_mesh()
        assert mesh.shape["d"] == 1
        assert mesh.shape["p"] == len(jax.devices())
        assert multihost.local_batch_slice(8) == slice(0, 8)


class TestRarePathGating:
    def test_second_detection_only_inside_batch_cond(self, rt):
        """VERDICT r3 #5: the compiled batched program must not
        double-execute the rare paths.  Structural check on the jaxpr:
        the TOP-LEVEL batched step contains exactly ONE ungated top-K
        detection (the matching phase's); the new-feature detection, the
        feature-addition covariance growth, and the conversion P surgery
        live inside lax.cond branches gated on batch-level triggers."""
        import jax

        from openekfmonoslam_tpu.parallel.batch_runner import (
            batched_step, make_batch_states)

        B = 3
        states = make_batch_states(rt, B, seeds=range(B))
        grays = jnp.zeros((B, rt.config.camera.pixels_y,
                           rt.config.camera.pixels_x), jnp.uint8)
        jaxpr = jax.make_jaxpr(
            lambda s, g: batched_step(rt, s, g))(states, grays)

        def count_prim(jx, name):
            """Occurrences of primitive ``name``, NOT descending into
            cond branches -- that exclusion is the point of the test."""
            n = 0
            for eqn in jx.eqns:
                if eqn.primitive.name == name:
                    n += 1
                if eqn.primitive.name == "cond":
                    continue
                for sub in eqn.params.values():
                    if hasattr(sub, "jaxpr"):
                        n += count_prim(sub.jaxpr, name)
                    elif isinstance(sub, (tuple, list)):
                        n += sum(count_prim(b.jaxpr, name) for b in sub
                                 if hasattr(b, "jaxpr"))
            return n

        def cond_branches(jx):
            out = []
            for eqn in jx.eqns:
                if eqn.primitive.name == "cond":
                    out.extend(b.jaxpr for b in eqn.params["branches"])
                    continue
                for sub in eqn.params.values():
                    if hasattr(sub, "jaxpr"):
                        out.extend(cond_branches(sub.jaxpr))
                    elif isinstance(sub, (tuple, list)):
                        for b in sub:
                            if hasattr(b, "jaxpr"):
                                out.extend(cond_branches(b.jaxpr))
            return out

        top = jaxpr.jaxpr
        # exactly one ungated detection top-K (phase_match's); the
        # second (new-feature) detection must NOT be in the top level
        assert count_prim(top, "approx_top_k") == 1
        # and it MUST exist inside some cond branch
        in_branches = sum(count_prim(b, "approx_top_k")
                          for b in cond_branches(top))
        assert in_branches >= 1
