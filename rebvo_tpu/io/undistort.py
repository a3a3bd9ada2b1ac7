"""Precomputed undistortion map.

Replaces image_undistort (reference src/VideoLib/image_undistort.cpp:
29-123): for every output pixel, its ideal coordinates are distorted
through the camera model once at build time; applying the map is a
bilinear 4-tap gather. Here the map is a pair of float32 source-
coordinate images and the apply is a vectorised jnp gather, jitted and
batchable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import CameraModel

Array = jax.Array


class UndistortMap(NamedTuple):
    src_x: Array   # [H, W] float source x for each output pixel
    src_y: Array


def build_undistort_map(cam: CameraModel) -> UndistortMap:
    """Distort each output pixel's ideal coordinate to find its source
    position in the distorted input (image_undistort.cpp:29-60)."""
    H, W = cam.height, cam.width
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    hx = jnp.asarray(xs) - cam.cx
    hy = jnp.asarray(ys) - cam.cy
    dx, dy = cam.distort_hom(hx, hy)
    return UndistortMap(src_x=(dx + cam.cx).astype(jnp.float32),
                        src_y=(dy + cam.cy).astype(jnp.float32))


@jax.jit
def apply_undistort(umap: UndistortMap, img: Array) -> Array:
    """Bilinear resample of the distorted input onto the ideal grid
    (image_undistort.h:104-123); out-of-range sources clamp to border."""
    H, W = img.shape[-2:]
    x = jnp.clip(umap.src_x, 0.0, W - 1)
    y = jnp.clip(umap.src_y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(img.shape[:-2] + (-1,))
    idx = y0 * W + x0

    def g(off):
        return jnp.take(flat, idx + off, axis=-1)

    v00 = g(0)
    v01 = g(1)
    v10 = g(W)
    v11 = g(W + 1)
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)
