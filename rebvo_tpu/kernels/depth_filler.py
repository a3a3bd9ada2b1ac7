"""Dense depth from sparse edge keylines on a coarse grid.

Re-implements the behaviour of depth_filler (reference
src/visualizer/depth_filler.cpp): block-downsampled grid seeded with
information-weighted keyline inverse depths, then relaxed so free cells
interpolate smoothly between the fixed edge cells.

TPU-first design: the reference's serial Gauss-Seidel sweep
(Integrate1Step, depth_filler.cpp:301-357) becomes Jacobi iterations
expressed as a 3x3 neighbour-average convolution under a fixed-cell
mask, run for a static iteration count via lax.scan — a pure stencil
pipeline, optionally coarse-to-fine.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.frontend.state import KeylineMap

Array = jax.Array


class DepthFill(NamedTuple):
    rho: Array      # [GH, GW] dense inverse depth on the grid
    s_rho: Array    # [GH, GW] uncertainty
    fixed: Array    # [GH, GW] bool — cell seeded by keylines
    block: int      # static block size (pixels per cell)


def _seed(klm: KeylineMap, gh: int, gw: int, block: int, s_rho_max: float):
    """Information-weighted per-cell mean of keyline inverse depths
    (depth_filler.cpp:59-168)."""
    cx = jnp.clip((klm.x / block).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((klm.y / block).astype(jnp.int32), 0, gh - 1)
    use = klm.valid & (klm.s_rho < s_rho_max)
    w = jnp.where(use, 1.0 / jnp.square(jnp.maximum(klm.s_rho, 1e-3)), 0.0)
    idx = jnp.where(use, cy * gw + cx, gh * gw)
    num = jnp.zeros((gh * gw,), klm.rho.dtype).at[idx].add(
        w * klm.rho, mode="drop")
    den = jnp.zeros((gh * gw,), klm.rho.dtype).at[idx].add(w, mode="drop")
    fixed = den > 0
    rho = jnp.where(fixed, num / jnp.where(fixed, den, 1.0), 0.0)
    s = jnp.where(fixed, jax.lax.rsqrt(jnp.where(fixed, den, 1.0)), 1e3)
    return (rho.reshape(gh, gw), s.reshape(gh, gw),
            fixed.reshape(gh, gw))


def _relax(rho: Array, fixed: Array, iters: int, init_fill: Array):
    """Jacobi relaxation: free cells move toward the 8-neighbour mean of
    currently-defined cells; fixed cells are clamped."""
    defined0 = fixed
    rho0 = jnp.where(fixed, rho, init_fill)

    kernel = jnp.asarray([[1.0, 1.0, 1.0],
                          [1.0, 0.0, 1.0],
                          [1.0, 1.0, 1.0]], rho.dtype)

    def conv(img):
        return jax.lax.conv_general_dilated(
            img[None, None], kernel[None, None], (1, 1), "SAME")[0, 0]

    def body(carry, _):
        r, defined = carry
        d = defined.astype(rho.dtype)
        nsum = conv(r * d)
        ncnt = conv(d)
        has_n = ncnt > 0
        mean = nsum / jnp.where(has_n, ncnt, 1.0)
        new_defined = defined | has_n
        r2 = jnp.where(fixed, r,
                       jnp.where(has_n, mean, r))
        return (r2, new_defined), None

    (r, _), _ = jax.lax.scan(body, (rho0, defined0), None, length=iters)
    return r


@partial(jax.jit, static_argnames=("width", "height", "block", "iters"))
def fill_depth(klm: KeylineMap, *, width: int, height: int, block: int = 8,
               iters: int = 60, s_rho_max: float = 20.0) -> DepthFill:
    """Build the dense inverse-depth grid from an edge map."""
    gw = (width + block - 1) // block
    gh = (height + block - 1) // block
    rho, s, fixed = _seed(klm, gh, gw, block, s_rho_max)
    # neutral fill: mean of seeded cells
    nfix = jnp.sum(fixed)
    mean_rho = jnp.sum(jnp.where(fixed, rho, 0.0)) / jnp.maximum(nfix, 1)
    dense = _relax(rho, fixed, iters, mean_rho)
    return DepthFill(rho=dense, s_rho=s, fixed=fixed, block=block)


def grid_points_3d(fill: DepthFill, zfm: Array, cx: Array, cy: Array):
    """Unproject the grid cells to 3D (camera frame); returns [GH, GW, 3]
    (depth_filler.h:107-170 accessors)."""
    gh, gw = fill.rho.shape
    ys = (jnp.arange(gh) + 0.5) * fill.block
    xs = (jnp.arange(gw) + 0.5) * fill.block
    gx, gy = jnp.meshgrid(xs, ys)
    rho = jnp.maximum(fill.rho, 1e-4)
    z = 1.0 / rho
    X = (gx - cx) * z / zfm
    Y = (gy - cy) * z / zfm
    return jnp.stack([X, Y, z], axis=-1)


def surface_normals(fill: DepthFill, zfm: Array, cx: Array, cy: Array):
    """Per-cell surface normals from central differences of the 3D grid
    (depth_filler.cpp:360-391)."""
    P = grid_points_3d(fill, zfm, cx, cy)
    dx = jnp.zeros_like(P)
    dy = jnp.zeros_like(P)
    dx = dx.at[:, 1:-1].set(P[:, 2:] - P[:, :-2])
    dy = dy.at[1:-1, :].set(P[2:, :] - P[:-2, :])
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.where(norm > 1e-9, norm, 1.0)
