"""Multi-host (multi-process) execution layer.

The reference is a single-process system; its only cross-machine channel
is the lossy telemetry UDP stream (SURVEY.md §2.5). The TPU-native
framework adds a real distributed compute plane (SURVEY.md §2.9): a
`jax.distributed` process group whose devices form one global mesh, with
XLA collectives (psum in the sharded BA, sharded batch axes in the
multi-sequence front end) riding ICI within a host and DCN across hosts.

On TPU pods this maps 1:1 (one process per host, devices = local chips).
In this repo's environment there is no multi-chip hardware, so the same
code paths are exercised with N CPU processes × M virtual CPU devices —
the documented JAX multi-process recipe — which is what the scaling
harness (apps/run_multihost.py) and tests/test_multihost.py drive.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, platform: str = "cpu",
               local_device_count: Optional[int] = None) -> None:
    """Join the process group. Must run before any JAX backend use.

    `platform="cpu"` (the test/CI topology) is forced through jax.config
    because the axon TPU plugin in this image ignores JAX_PLATFORMS; the
    virtual per-process device count must already be set via XLA_FLAGS
    (--xla_force_host_platform_device_count) in the environment."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_data_mesh():
    """1-D ('data',) mesh over ALL global devices (every process's)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), ("data",))


def host_local_to_global(mesh, tree, axis: int = 0):
    """Assemble per-process local arrays into global jax.Arrays sharded
    along `axis` over the mesh's data axis: each process contributes its
    local block (jax.make_array_from_process_local_data)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[axis] = "data"
        sharding = NamedSharding(mesh, P(*spec))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, tree)


def replicate_global(mesh, tree):
    """Replicate host-identical arrays across the global mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x)

    return jax.tree_util.tree_map(put, tree)


def fetch_replicated(tree):
    """Host copy of replicated global outputs (addressable everywhere)."""
    import jax
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)
