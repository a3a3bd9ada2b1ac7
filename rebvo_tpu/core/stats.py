"""Small statistics utilities.

Re-implements NormalDistribution (reference
include/UtilLib/NormalDistribution.h:30-150): a tabulated Gaussian pdf
and the reciprocal-moment evaluation used by edge_tracker's full-noise
depth-EKF variant (edge_tracker.h) — the mean/deviation of 1/X for
X ~ N(mean, dev), estimated from an n-point grid of the pdf.

TPU-first: no lookup table (exp on the VPU is cheap and exact where the
reference quantises), everything batched/vmappable with fixed shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_INV_SQRT_2PI = 0.3989422804014327


def normal_pdf(x: Array, mu: Array, sigma: Array) -> Array:
    """Gaussian pdf (the table's exact limit; eval(),
    NormalDistribution.h:56-66)."""
    z = (x - mu) / sigma
    return _INV_SQRT_2PI * jnp.exp(-0.5 * z * z) / sigma


def eval_reciprocal(mean: Array, dev: Array, r: float = 1.0,
                    n: int = 10) -> Tuple[Array, Array]:
    """Moment-matched distribution of 1/X for X ~ N(mean, dev)
    (EvalReciprocal, NormalDistribution.h:69-140): sample the pdf on an
    n-point grid spanning +-r*dev, weight the reciprocals, and return
    (mean of 1/X, deviation of 1/X).

    Grid points at exactly zero are excluded (their reciprocal carries
    no probability mass in the discretisation — the reference pairs them
    with +-inf entries that cancel; masking is the fixed-shape form).
    Scalar or batched inputs (broadcasting over leading axes)."""
    mean = jnp.asarray(mean)
    dev = jnp.asarray(dev)
    i = jnp.arange(n, dtype=mean.dtype)
    x = 2.0 * dev[..., None] * r * (i - n // 2) / (n - 1.0) + mean[..., None]
    p = normal_pdf(x, mean[..., None], dev[..., None])
    nonzero = jnp.abs(x) > 0
    p = jnp.where(nonzero, p, 0.0)
    rx = jnp.where(nonzero, 1.0 / jnp.where(nonzero, x, 1.0), 0.0)
    mass = jnp.sum(p, axis=-1)
    mass = jnp.where(mass > 0, mass, 1.0)
    mr = jnp.sum(rx * p, axis=-1) / mass
    vr = jnp.sum(jnp.square(rx - mr[..., None]) * p, axis=-1) / mass
    return mr, jnp.sqrt(vr)


def masked_median(x, mask, fallback: float = 1.0):
    """Median of x where mask, via one sort (TPU-friendly: fixed shapes,
    no dynamic slicing); `fallback` when nothing is masked in."""
    xs = jnp.sort(jnp.where(mask, x, jnp.asarray(jnp.inf, x.dtype)))
    cnt = jnp.sum(mask).astype(jnp.int32)
    med = xs[jnp.clip((cnt - 1) // 2, 0, x.shape[-1] - 1)]
    return jnp.where(cnt > 0, med, jnp.asarray(fallback, x.dtype))
