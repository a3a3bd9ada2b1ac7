"""Occupancy-grid surface integration over keyframes.

Re-implements the behaviour of surface_integrator (reference
src/visualizer/surface_integrator.cpp): a world-space occupancy grid
accumulating every keyframe's dense-depth surfels (OcGrid), plus
visibility ray-culling between keyframes. TPU-first: surfels from all
keyframes scatter-add into one voxel grid in a single op; ray-culling
uses a batched DDA sampling instead of the per-surfel recursive cut.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class OcGrid(NamedTuple):
    count: Array    # [Nx, Ny, Nz] surfel hit counts
    lo: Array       # [3] world-space origin
    voxel: Array    # scalar voxel edge length


def world_bounds(points: Array, margin: float = 0.5):
    """Bounds estimate over surfel clouds (surface_integrator.cpp:32)."""
    lo = jnp.min(points.reshape(-1, 3), axis=0) - margin
    hi = jnp.max(points.reshape(-1, 3), axis=0) + margin
    return lo, hi


@partial(jax.jit, static_argnames=("nx", "ny", "nz"))
def build_ocgrid(points: Array, valid: Array, lo: Array, voxel: Array,
                 *, nx: int, ny: int, nz: int) -> OcGrid:
    """Scatter world points into the voxel grid (OcGrid fill,
    surface_integrator.cpp:120-233). points [..., 3], valid [...]."""
    P = points.reshape(-1, 3)
    V = valid.reshape(-1)
    ijk = jnp.floor((P - lo) / voxel).astype(jnp.int32)
    inb = V & jnp.all((ijk >= 0) & (ijk < jnp.asarray([nx, ny, nz])), axis=-1)
    lin = (ijk[:, 0] * ny + ijk[:, 1]) * nz + ijk[:, 2]
    lin = jnp.where(inb, lin, nx * ny * nz)
    count = jnp.zeros((nx * ny * nz,), jnp.int32).at[lin].add(
        1, mode="drop")
    return OcGrid(count=count.reshape(nx, ny, nz), lo=lo, voxel=voxel)


def ray_cut_visibility(grid: OcGrid, cam_pos: Array, points: Array,
                       n_samples: int = 32, occupancy_min: int = 1) -> Array:
    """For each point, check whether the ray from the camera reaches it
    without crossing occupied voxels (the reference's ray-cut culling,
    surface_integrator.cpp:235-268). Returns a visibility mask."""
    nx, ny, nz = grid.count.shape
    P = points.reshape(-1, 3)
    ts = (jnp.arange(1, n_samples) / n_samples)[None, :, None]
    samples = cam_pos[None, None, :] + (P - cam_pos)[:, None, :] * ts
    ijk = jnp.floor((samples - grid.lo) / grid.voxel).astype(jnp.int32)
    inb = jnp.all((ijk >= 0) & (ijk < jnp.asarray([nx, ny, nz])), axis=-1)
    lin = (ijk[..., 0] * ny + ijk[..., 1]) * nz + ijk[..., 2]
    occ = jnp.where(inb, grid.count.reshape(-1)[jnp.clip(lin, 0,
                                                         nx * ny * nz - 1)],
                    0)
    # exclude the last few samples (the target's own voxel neighbourhood)
    guard = int(n_samples * 0.9)
    blocked = jnp.any(occ[:, :guard] >= occupancy_min, axis=-1)
    return (~blocked).reshape(points.shape[:-1])
