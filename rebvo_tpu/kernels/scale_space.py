"""Scale-space construction: DoG + gradient via chained box filters.

Reproduces the behaviour of the reference's iimage/iigauss/sspace stack
(reference src/mtracklib/iimage.cpp, iigauss.cpp, sspace.cpp): a Gaussian
of deviation sigma is approximated by `box_n` successive box filters
(Kovesi's method, two sizes wl / wl+2), borders normalised by the clipped
box area. The DoG is the difference of two such pyramids at sigma0 and
sigma0*k, and the gradient is the central difference of the sigma0 image.

TPU-first design: instead of the reference's serial integral images, each
box pass is two 1-D prefix-sum filters (rows then columns) — XLA lowers
cumsum to an efficient scan and fuses the normalisation; everything is a
fixed-shape elementwise pipeline, no data-dependent control flow.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def kovesi_box_sizes(sigma: float, box_n: int) -> Tuple[List[int], float]:
    """Box-filter widths approximating a Gaussian of deviation `sigma`.

    Mirrors the constructor math of iigauss (iigauss.cpp:43-80): m filters
    of odd width wl and (box_n - m) of width wl+2; returns the widths and
    the achieved deviation sigma_r.
    """
    wideal = math.sqrt(12.0 * sigma * sigma / box_n + 1.0)
    wl = int(wideal)
    if wl % 2 == 0:
        wl -= 1
    wl = max(wl, 1)
    m = round((3 * box_n + 4 * box_n * wl + box_n * wl * wl - 12 * sigma * sigma)
              / (4 + 4 * wl))
    m = min(max(m, 0), box_n)
    sizes = [wl] * m + [wl + 2] * (box_n - m)
    sigma_r = math.sqrt((m * wl * wl + (box_n - m) * (wl + 2.0) ** 2 - box_n) / 12.0)
    return sizes, sigma_r


def _box_1d(x: Array, d: int, axis: int) -> Tuple[Array, Array]:
    """Clipped 1-D box sum of odd width d along `axis`, plus the per-pixel
    window count (the reference's precomputed divisor, iimage.cpp:86-180).
    """
    if d <= 1:
        return x, jnp.ones_like(x)
    n = x.shape[axis]
    d2 = d // 2
    c = jnp.cumsum(x, axis=axis)
    zero_shape = list(x.shape)
    zero_shape[axis] = 1
    zero = jnp.zeros(zero_shape, dtype=x.dtype)
    c = jnp.concatenate([zero, c], axis=axis)  # c[i] = sum of x[:i]
    idx = jnp.arange(n)
    hi = jnp.minimum(idx + d2 + 1, n)
    lo = jnp.maximum(idx - d2, 0)
    s = jnp.take(c, hi, axis=axis) - jnp.take(c, lo, axis=axis)
    count = (hi - lo).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = n
    return s, count.reshape(shape)


def box_filter(img: Array, d: int) -> Array:
    """Normalised clipped 2-D box filter of odd width d (iimage::average)."""
    sy, cy = _box_1d(img, d, axis=-2)
    sxy, cx = _box_1d(sy, d, axis=-1)
    return sxy / (cy * cx)


def gaussian_smooth(img: Array, sizes: List[int]) -> Array:
    """Chain of box filters (iigauss::smooth, iigauss.cpp:91-103)."""
    out = img
    for d in sizes:
        out = box_filter(out, d)
    return out


class ScaleSpace(NamedTuple):
    """Output bundle of `build_scale_space` (the reference's `sspace`)."""

    img0: Array   # sigma0-smoothed image
    img1: Array   # sigma0*k-smoothed image
    dog: Array    # img1 - img0 (sspace.cpp:63-70)
    dx: Array     # central-difference gradient of img0 (sspace.cpp:75-85)
    dy: Array


def scale_space_plan(sigma0: float, k_sigma: float, box_n: int = 3):
    """Static filter plan: the second pyramid's sigma is derived from the
    *achieved* sigma_r of the first (sspace ctor, sspace.cpp:38-46)."""
    sizes0, sigma_r0 = kovesi_box_sizes(sigma0, box_n)
    sizes1, sigma_r1 = kovesi_box_sizes(sigma_r0 * k_sigma, box_n)
    return sizes0, sizes1, sigma_r0, sigma_r1


@partial(jax.jit, static_argnames=("sigma0", "k_sigma", "box_n"))
def build_scale_space(img: Array, sigma0: float, k_sigma: float,
                      box_n: int = 3) -> ScaleSpace:
    """Full scale-space build (sspace::build, sspace.cpp:52-60).

    `img` is a [..., H, W] float image; leading axes batch. Integer
    inputs are promoted to float32 up front (the box-filter prefix sums
    would otherwise accumulate — and overflow — in the integer dtype).
    """
    if not jnp.issubdtype(img.dtype, jnp.floating):
        img = img.astype(jnp.float32)
    sizes0, sizes1, _, _ = scale_space_plan(sigma0, k_sigma, box_n)
    img0 = gaussian_smooth(img, sizes0)
    img1 = gaussian_smooth(img, sizes1)
    dog = img1 - img0
    # Central differences, zero at the 1-pixel border.
    dx = jnp.zeros_like(img0)
    dy = jnp.zeros_like(img0)
    dx = dx.at[..., 1:-1, 1:-1].set(img0[..., 1:-1, 2:] - img0[..., 1:-1, :-2])
    dy = dy.at[..., 1:-1, 1:-1].set(img0[..., 2:, 1:-1] - img0[..., :-2, 1:-1])
    return ScaleSpace(img0=img0, img1=img1, dog=dog, dx=dx, dy=dy)
