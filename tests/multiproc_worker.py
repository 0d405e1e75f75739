"""Worker for tests/test_multiprocess.py: one of N coordinated JAX
processes forming a (hosts x local-devices) mesh on CPU.

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device global runtime -- the REAL multi-process code path
(global arrays, cross-process collectives over the distributed client)
that single-process virtual-mesh tests cannot reach.

Runs the 2-axis production layout from parallel/multihost.py: 'd'
(stream batch) across processes, 'p' (P block rows) within each
process's local devices; executes batched sharded steps on synthetic
frames and checks the result is finite and consistent.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord = sys.argv[1]
    n_proc = int(sys.argv[2])
    pid = int(sys.argv[3])

    from openekfmonoslam_tpu.parallel import multihost

    assert multihost.initialize(coord, n_proc, pid), "distributed init failed"
    assert jax.process_count() == n_proc
    assert len(jax.devices()) == n_proc * 4, len(jax.devices())

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openekfmonoslam_tpu.config import (CameraCalibration, EKFParams,
                                            SlamConfig)
    from openekfmonoslam_tpu.engine.step import SlamRuntime
    from openekfmonoslam_tpu.parallel import batch_runner as br

    cam = CameraCalibration(
        pixels_x=128, pixels_y=96, fx=100.0, fy=100.0, cx=64.0, cy=48.0,
        k1=-0.01, k2=0.001, dx=0.01, dy=0.01,
        angular_vision_x=45.0, angular_vision_y=35.0)
    ekf = EKFParams(min_matches_per_image=8,
                    detect_new_features_image_areas_divide_times=1)
    cfg = SlamConfig(camera=cam, ekf=ekf, max_features=16, max_keypoints=64,
                     dtype="float32", pad_state_to=64,
                     detector=dataclasses.replace(SlamConfig().detector,
                                                  threshold=12.0))
    rt = SlamRuntime(cfg)

    mesh = multihost.make_host_mesh()          # ('d' x procs, 'p' x 4)
    assert mesh.devices.shape == (n_proc, 4)

    # one SLAM stream per PROCESS: batch axis 'd' across processes, each
    # stream's covariance row-sharded over the process's 4 local devices
    B = n_proc
    states = br.make_batch_states(rt, B, seeds=list(range(B)))
    sh = br.batch_state_shardings_2d(mesh, "d", "p")
    states = jax.tree.map(
        lambda leaf, s: jax.make_array_from_process_local_data(
            s, np.asarray(leaf)), states, sh)

    rng = np.random.default_rng(0)
    img = np.zeros((96, 128), np.uint8)
    for _ in range(60):
        y, x = rng.integers(5, 91), rng.integers(5, 123)
        img[y - 2:y + 2, x - 2:x + 2] = rng.integers(80, 255)
    frames_np = np.broadcast_to(img, (B, 3, 96, 128)).copy()
    fsh = NamedSharding(mesh, P("d"))
    frames = jax.make_array_from_process_local_data(fsh, frames_np)

    init_b = jax.jit(jax.vmap(rt.init_step), in_shardings=(sh, fsh),
                     out_shardings=sh)
    step_b = jax.jit(jax.vmap(rt.step),
                     in_shardings=(sh, fsh),
                     out_shardings=(sh, NamedSharding(mesh, P("d"))))

    states = init_b(states, frames[:, 0])
    rec = None
    for t in range(1, 3):
        states, rec = step_b(states, frames[:, t])
    jax.block_until_ready(states.x)

    # each process checks its addressable shards (its own stream's slice
    # of the global arrays); a cross-process psum exercises the
    # distributed collective path explicitly
    n_local = sorted({int(v) for s in rec.n_active.addressable_shards
                      for v in np.asarray(s.data).ravel()})
    x_local = np.asarray([np.asarray(s.data)
                          for s in states.x.addressable_shards][0])
    assert np.isfinite(x_local).all()
    assert all(n > 0 for n in n_local), n_local

    from jax.sharding import NamedSharding, PartitionSpec as PS

    @jax.jit
    def global_sum(v):
        return jnp.sum(v)
    total = int(global_sum(rec.n_active))    # reduces across processes
    assert total >= sum(n_local)
    print(f"proc {pid}: ok, local n_active = {n_local}, "
          f"global sum = {total}", flush=True)


if __name__ == "__main__":
    main()
