"""Dense depth from sparse edge keylines on a coarse grid.

Re-implements the behaviour of depth_filler (reference
src/visualizer/depth_filler.cpp): block-downsampled grid seeded with
information-weighted keyline inverse depths, coarse-to-fine
initialisation of the free cells (InitCoarseFine, depth_filler.cpp:233-
278), then relaxation so free cells interpolate smoothly between the
fixed edge cells — inverse depth AND its uncertainty are both relaxed
(Integrate1Step, depth_filler.cpp:301-357), with the reference's
boundary modes (BOUND_NONE / BOUND_CORNERS / BOUND_FULL,
depth_filler.h:62: boundary cells keep their seeded s_rho).

TPU-first design: the serial Gauss-Seidel sweep becomes Jacobi
iterations expressed as a 3x3 neighbour-average convolution under a
fixed-cell mask, run for a static iteration count via lax.scan; the
coarse-to-fine pass is a power-of-two masked average-pool pyramid
broadcast back down — pure stencil pipelines, no data-dependent control
flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.frontend.state import KeylineMap

Array = jax.Array

BOUND_NONE = "none"
BOUND_CORNERS = "corners"
BOUND_FULL = "full"


class DepthFill(NamedTuple):
    rho: Array      # [GH, GW] dense inverse depth on the grid
    s_rho: Array    # [GH, GW] relaxed uncertainty
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


def _boundary_mask(gh: int, gw: int, mode: str) -> Array:
    """Cells whose s_rho is pinned (inboundary, depth_filler.cpp)."""
    m = jnp.zeros((gh, gw), bool)
    if mode == BOUND_FULL:
        m = m.at[0, :].set(True).at[-1, :].set(True)
        m = m.at[:, 0].set(True).at[:, -1].set(True)
    elif mode == BOUND_CORNERS:
        m = m.at[0, 0].set(True).at[0, -1].set(True)
        m = m.at[-1, 0].set(True).at[-1, -1].set(True)
    return m


def _coarse_to_fine_init(rho: Array, s: Array, fixed: Array,
                         fill_rho: Array) -> Tuple[Array, Array]:
    """InitCoarseFine (depth_filler.cpp:233-278): free cells take the
    block mean of the fixed cells covering them, from coarse blocks down
    to fine — each finer level refines where it has fixed support.

    Implemented as a masked average-pool pyramid on a power-of-two pad:
    level k pools 2^k x 2^k blocks of (fixed ? value : 0) and the fixed
    count; a free cell takes the finest level whose block saw a fixed
    cell."""
    gh, gw = rho.shape
    import math
    ph = 1 << max(1, math.ceil(math.log2(max(gh, 1))))
    pw = 1 << max(1, math.ceil(math.log2(max(gw, 1))))

    f = fixed.astype(rho.dtype)
    vr = jnp.zeros((ph, pw), rho.dtype).at[:gh, :gw].set(rho * f)
    vs = jnp.zeros((ph, pw), rho.dtype).at[:gh, :gw].set(s * f)
    vf = jnp.zeros((ph, pw), rho.dtype).at[:gh, :gw].set(f)

    out_r = jnp.zeros((ph, pw), rho.dtype)
    out_s = jnp.zeros((ph, pw), rho.dtype)
    have = jnp.zeros((ph, pw), bool)
    # coarse -> fine: finer levels overwrite where they have support
    n_levels = max(int(math.log2(ph)), int(math.log2(pw))) + 1
    for k in range(n_levels - 1, -1, -1):
        bh, bw = min(1 << k, ph), min(1 << k, pw)
        nh, nw = ph // bh, pw // bw
        cnt = vf.reshape(nh, bh, nw, bw).sum(axis=(1, 3))
        rsum = vr.reshape(nh, bh, nw, bw).sum(axis=(1, 3))
        ssum = vs.reshape(nh, bh, nw, bw).sum(axis=(1, 3))
        has = cnt > 0
        mr = jnp.where(has, rsum / jnp.where(has, cnt, 1.0), 0.0)
        ms = jnp.where(has, ssum / jnp.where(has, cnt, 1.0), 0.0)
        up = lambda a: jnp.repeat(jnp.repeat(a, bh, axis=0), bw, axis=1)
        has_up = up(has)
        out_r = jnp.where(has_up, up(mr), out_r)
        out_s = jnp.where(has_up, up(ms), out_s)
        have = have | has_up

    out_r = out_r[:gh, :gw]
    out_s = out_s[:gh, :gw]
    have = have[:gh, :gw]
    rho_init = jnp.where(fixed, rho,
                         jnp.where(have, out_r, fill_rho))
    s_init = jnp.where(fixed, s, jnp.where(have, out_s, 1e3))
    return rho_init, s_init


def _relax(rho: Array, s: Array, fixed: Array, boundary: Array,
           iters: int):
    """Jacobi relaxation of rho and s_rho: free cells move toward the
    8-neighbour mean; fixed cells clamp rho; boundary cells clamp s_rho
    (Integrate1Step semantics with w=1, fix_fixed=true)."""
    kernel = jnp.asarray([[1.0, 1.0, 1.0],
                          [1.0, 0.0, 1.0],
                          [1.0, 1.0, 1.0]], rho.dtype)

    def conv(img):
        return jax.lax.conv_general_dilated(
            img[None, None], kernel[None, None], (1, 1), "SAME")[0, 0]

    ones = jnp.ones_like(rho)
    ncnt = conv(ones)

    def body(carry, _):
        r, sr = carry
        mean_r = conv(r) / ncnt
        mean_s = conv(sr) / ncnt
        r2 = jnp.where(fixed, r, mean_r)
        s2 = jnp.where(boundary, sr, mean_s)
        return (r2, s2), None

    (r, sr), _ = jax.lax.scan(body, (rho, s), None, length=iters)
    return r, sr


@partial(jax.jit, static_argnames=("width", "height", "block", "iters",
                                   "coarse_to_fine", "bound_mode"))
def fill_depth(klm: KeylineMap, *, width: int, height: int, block: int = 8,
               iters: int = 60, s_rho_max: float = 20.0,
               coarse_to_fine: bool = True,
               bound_mode: str = BOUND_NONE) -> DepthFill:
    """Build the dense inverse-depth grid from an edge map."""
    gw = (width + block - 1) // block
    gh = (height + block - 1) // block
    rho, s, fixed = _seed(klm, gh, gw, block, s_rho_max)
    nfix = jnp.sum(fixed)
    mean_rho = jnp.sum(jnp.where(fixed, rho, 0.0)) / jnp.maximum(nfix, 1)
    if coarse_to_fine:
        rho0, s0 = _coarse_to_fine_init(rho, s, fixed, mean_rho)
    else:
        rho0 = jnp.where(fixed, rho, mean_rho)
        s0 = s
    boundary = _boundary_mask(gh, gw, bound_mode)
    # non-fixed boundary cells never receive relaxed uncertainty: they
    # keep the unknown-depth sentinel (the reference's inboundary cells
    # are excluded from the s_rho update everywhere)
    s0 = jnp.where(boundary & ~fixed, 1e3, s0)
    dense, s_dense = _relax(rho0, s0, fixed, boundary | fixed, iters)
    return DepthFill(rho=dense, s_rho=s_dense, fixed=fixed, block=block)


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
