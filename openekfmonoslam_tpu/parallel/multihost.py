"""Multi-host deployment: jax.distributed bring-up + host-aware meshes.

No reference counterpart (SURVEY.md section 2.7) -- this is the TPU
framework's "communication backend": XLA collectives over ICI within a
slice and DCN across hosts, reached purely through sharding annotations.

Deployment model for the two parallel axes implemented by this package:

  * 'd' (stream data parallelism, parallel/batch_runner.py): camera
    streams are independent, so the 'd' axis should span HOSTS -- the only
    cross-device traffic is none, so DCN placement costs nothing.
  * 'p' (map-covariance model parallelism, parallel/sharding.py): the
    P-sharded update is collective-heavy (all-gather of HP strips, psum of
    S), so 'p' must stay INSIDE a host's ICI domain.

`make_host_mesh` builds the (d, p) mesh with exactly that layout:
contiguous per-host device groups become the 'p' axis so its collectives
ride ICI, and the host dimension becomes 'd' over DCN.

Bring-up on each host::

    from openekfmonoslam_tpu.parallel import multihost
    multihost.initialize()            # env-driven (TPU pods auto-detect)
    mesh = multihost.make_host_mesh()

Single-process runs (tests, one host) work unchanged: initialize() is a
no-op fallback and the mesh spans the local devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """jax.distributed.initialize with graceful single-process fallback.

    On TPU pods all arguments auto-detect from the environment; pass them
    explicitly for CPU/GPU multi-process runs.  Returns True when a
    multi-process runtime was initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return jax.process_count() > 1
    except (ValueError, RuntimeError):
        # already initialized, or single-process environment
        return jax.process_count() > 1


def make_host_mesh(axis_hosts: str = "d", axis_local: str = "p") -> Mesh:
    """(hosts, devices-per-host) mesh: '{axis_hosts}' over DCN,
    '{axis_local}' over each host's ICI domain.

    jax.devices() orders devices by process; reshaping to
    (process_count, local_count) therefore groups each host's devices on
    the second axis.
    """
    devs = np.asarray(jax.devices())
    n_proc = jax.process_count()
    local = len(devs) // n_proc
    grid = devs.reshape(n_proc, local)
    return Mesh(grid, (axis_hosts, axis_local))


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) slice of a 'd'-sharded global stream batch owned
    by this process -- for feeding per-host frame sources."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
