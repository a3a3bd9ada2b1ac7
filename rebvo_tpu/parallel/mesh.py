"""Device-mesh construction and multi-sequence sharding.

The reference's only parallelism is a 3-thread pipeline + NEON SIMD
(SURVEY.md §2.9). The TPU-native replacements are:

  * per-keyline batch axis inside each kernel (VPU/MXU vectorisation —
    the analogue of the NE10 LTCV layout), always on;
  * a `data` mesh axis sharding *sequences* (the reference has nothing
    comparable — it processes one stream; here all EuRoC sequences run
    as one batched, sharded computation);
  * (round 2+) keyline-block sharding of the bundle-adjustment backend
    with psum'd Schur reductions over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None, backend: str = None,
              allow_cpu_fallback: bool = False) -> Mesh:
    """1-D mesh over `n_devices` (default: all) named ('data',).

    Raises when the backend has fewer devices than requested — a
    misconfigured accelerator count must never silently downgrade to a
    smaller mesh or another backend. `allow_cpu_fallback=True` opts in
    to retrying on the CPU backend (which honours
    --xla_force_host_platform_device_count) with a printed notice; it is
    meant for sharding dry runs and CI, not for benchmarking."""
    devs = jax.devices(backend) if backend else jax.devices()
    if (n_devices is not None and len(devs) < n_devices
            and backend is None and allow_cpu_fallback):
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n_devices:
            print(f"data_mesh: default backend has {len(devs)} device(s) "
                  f"< {n_devices}; falling back to {n_devices} virtual "
                  f"CPU devices (allow_cpu_fallback=True)")
            devs = cpu
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available on backend "
                f"{devs[0].platform if devs else '?'}; pass "
                f"allow_cpu_fallback=True to dry-run on virtual CPU "
                f"devices instead")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def shard_batch(tree, mesh: Mesh):
    """Place a pytree whose leaves lead with the sequence/batch axis so
    that axis is sharded over the mesh's `data` axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def shard_sequences(fn, mesh: Mesh):
    """jit(shard_map(vmap(fn))) over the mesh's `data` axis: the
    canonical wrapper for running a batch of independent sequences.

    Independent sequences need NO cross-shard communication, but leaving
    that to GSPMD sharding propagation inserts collectives wherever an
    op's sharding rule falls back to replication (measured: a 2-process
    CPU mesh ran the batch-sharded VO step at ~1.3 s/step through GSPMD
    vs ~5 ms/step through shard_map — the collectives were pure
    overhead). shard_map makes the no-communication structure a static
    guarantee, on TPU pods exactly as on the CPU test topology."""
    spec = P("data")
    return jax.jit(jax.shard_map(jax.vmap(fn), mesh=mesh,
                                 in_specs=spec, out_specs=spec))
