"""Fused Pallas TPU kernel for the scale-space build.

The reference computes its scale space as six separate 2-D box-filter
passes over integral images plus a DoG subtraction and a gradient pass
(reference src/mtracklib/iimage.cpp:53-180, iigauss.cpp:43-103,
sspace.cpp:52-85) — on TPU, done naively (kernels/scale_space.py), that
is ~14 HBM round trips over the frame. A EuRoC frame is 480x752 f32 =
1.4 MB, far below VMEM capacity, so the whole chain fits on-chip: this
kernel loads the frame into VMEM once and emits the five outputs
(img0, img1, dog, dx, dy) in a single fused pass — one HBM read plus
five writes, the bandwidth speed-of-light for this op.

In-kernel layout notes:
- Each 1-D clipped box sum is a cumsum followed by *static* shifted
  slices (`concatenate` of lane/sublane slices), never a gather —
  Mosaic lowers these to cheap vector shifts.
- The clipped-window divisor (the reference's precomputed border
  divisor image, iimage.cpp:86-131) is rebuilt from `broadcasted_iota`
  so the kernel closes over no device-array constants (see
  tests/test_no_captured_consts.py for why that matters here).
- Batched use (vmap over sequences) adds a leading grid dimension; the
  per-program block is always one whole frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rebvo_tpu.kernels.scale_space import ScaleSpace, scale_space_plan

Array = jax.Array


def _box_sum_last(x: Array, d: int) -> Array:
    """Clipped box sum of odd width d along the last (lane) axis as a
    sum of zero-padded static shifts (Mosaic has no cumsum; for the
    small Kovesi widths, d-1 vector adds is the cheaper form anyway).
    Zero padding *is* the window clipping. x is [H, W]."""
    d2 = d // 2
    H, W = x.shape
    out = x
    for k in range(1, d2 + 1):
        z = jnp.zeros((H, k), x.dtype)
        out = out + jnp.concatenate([x[:, k:], z], axis=-1)   # x[i+k]
        out = out + jnp.concatenate([z, x[:, :W - k]], axis=-1)  # x[i-k]
    return out


def _box_sum_sub(x: Array, d: int) -> Array:
    """Same along the second-to-last (sublane) axis."""
    d2 = d // 2
    H, W = x.shape
    out = x
    for k in range(1, d2 + 1):
        z = jnp.zeros((k, W), x.dtype)
        out = out + jnp.concatenate([x[k:, :], z], axis=-2)
        out = out + jnp.concatenate([z, x[:H - k, :]], axis=-2)
    return out


def _inv_count_1d(n: int, d: int, shape, dim: int) -> Array:
    """Reciprocal clipped window size 1/(min(i+d2+1,n) - max(i-d2,0)) as
    a broadcastable vector ((H,1) or (1,W)) built from iota in-kernel
    (no captured constants); kept rank-2 but thin so the two divisor
    factors cost ~one vector register each instead of a full frame."""
    d2 = d // 2
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=dim)
    hi = jnp.minimum(idx + (d2 + 1), n)
    lo = jnp.maximum(idx - d2, 0)
    return 1.0 / (hi - lo).astype(jnp.float32)


def _box_filter(x: Array, d: int) -> Array:
    """Normalised clipped 2-D box filter (iimage::average semantics)."""
    if d <= 1:
        return x
    H, W = x.shape
    s = _box_sum_last(_box_sum_sub(x, d), d)
    s = s * _inv_count_1d(H, d, (H, 1), 0)
    s = s * _inv_count_1d(W, d, (1, W), 1)
    return s


def _sspace_kernel(sizes0, sizes1, img_ref, img0_ref, img1_ref, dog_ref,
                   dx_ref, dy_ref):
    # Stage each pyramid through its output ref as soon as it is final
    # so the compiler can retire the working buffers (VMEM headroom).
    x1 = img_ref[:]
    for d in sizes1:
        x1 = _box_filter(x1, d)
    img1_ref[:] = x1
    x0 = img_ref[:]
    for d in sizes0:
        x0 = _box_filter(x0, d)
    img0_ref[:] = x0
    dog_ref[:] = img1_ref[:] - x0
    # Central differences, zero on the 1-pixel border (sspace.cpp:75-85).
    H, W = x0.shape
    right = jnp.concatenate([x0[:, 1:], x0[:, W - 1:]], axis=-1)
    left = jnp.concatenate([x0[:, :1], x0[:, :W - 1]], axis=-1)
    down = jnp.concatenate([x0[1:, :], x0[H - 1:, :]], axis=-2)
    up = jnp.concatenate([x0[:1, :], x0[:H - 1, :]], axis=-2)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((ii > 0) & (ii < H - 1) & (jj > 0) & (jj < W - 1))
    dx_ref[:] = jnp.where(interior, right - left, 0.0)
    dy_ref[:] = jnp.where(interior, down - up, 0.0)


def _window_sum_last(x: Array, w: int) -> Array:
    """Zero-padded (2w+1) window sum along lanes (matches the XLA
    detector's _shift2d convention: out[y,x] = sum_j x[y, x+j])."""
    H, W = x.shape
    out = x
    for k in range(1, w + 1):
        z = jnp.zeros((H, k), x.dtype)
        out = out + jnp.concatenate([x[:, k:], z], axis=-1)
        out = out + jnp.concatenate([z, x[:, :W - k]], axis=-1)
    return out


def _window_sum_sub(x: Array, w: int) -> Array:
    H, W = x.shape
    out = x
    for k in range(1, w + 1):
        z = jnp.zeros((k, W), x.dtype)
        out = out + jnp.concatenate([x[k:, :], z], axis=-2)
        out = out + jnp.concatenate([z, x[:H - k, :]], axis=-2)
    return out


def _window_wsum_last(x: Array, w: int) -> Array:
    """Window sum weighted by the lane offset j: sum_j j * x[y, x+j]."""
    H, W = x.shape
    out = jnp.zeros_like(x)
    for k in range(1, w + 1):
        z = jnp.zeros((H, k), x.dtype)
        out = out + float(k) * jnp.concatenate([x[:, k:], z], axis=-1)
        out = out - float(k) * jnp.concatenate([z, x[:, :W - k]], axis=-1)
    return out


def _window_wsum_sub(x: Array, w: int) -> Array:
    H, W = x.shape
    out = jnp.zeros_like(x)
    for k in range(1, w + 1):
        z = jnp.zeros((k, W), x.dtype)
        out = out + float(k) * jnp.concatenate([x[k:, :], z], axis=-2)
        out = out - float(k) * jnp.concatenate([z, x[:H - k, :]], axis=-2)
    return out


def _detect_kernel(sizes0, sizes1, win_s, per_hist, dog_thresh,
                   max_img_value, img_ref, thresh_ref, mask_ref, tx_ref,
                   ty_ref, xs_ref, ys_ref, n2_ref):
    """Fused frame -> detector candidates: the whole scale-space chain
    plus every per-pixel detector test in one VMEM pass. The five
    scale-space images never touch HBM."""
    x1 = img_ref[:]
    for d in sizes1:
        x1 = _box_filter(x1, d)
    x0 = img_ref[:]
    for d in sizes0:
        x0 = _box_filter(x0, d)
    dog = x1 - x0
    H, W = x0.shape

    # central differences of img0, zero border
    right = jnp.concatenate([x0[:, 1:], x0[:, W - 1:]], axis=-1)
    left = jnp.concatenate([x0[:, :1], x0[:, :W - 1]], axis=-1)
    down = jnp.concatenate([x0[1:, :], x0[H - 1:, :]], axis=-2)
    up = jnp.concatenate([x0[:1, :], x0[:H - 1, :]], axis=-2)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior1 = (ii > 0) & (ii < H - 1) & (jj > 0) & (jj < W - 1)
    dx = jnp.where(interior1, right - left, 0.0)
    dy = jnp.where(interior1, down - up, 0.0)

    grad_thresh = thresh_ref[0, 0]
    win_area = float((2 * win_s + 1) ** 2)
    sum_j2 = float((2 * win_s + 1) *
                   sum(j * j for j in range(-win_s, win_s + 1)))

    # Test 1: image gradient norm
    t1 = dx * dx + dy * dy >= jnp.square(grad_thresh * max_img_value)

    # Test 2: DoG sign balance
    sign = jnp.where(dog > 0, 1.0, -1.0)
    pn = _window_sum_last(_window_sum_sub(sign, win_s), win_s)
    t2 = jnp.abs(pn) <= win_area * per_hist

    # plane fit (orthogonal regressors)
    theta_x = _window_sum_sub(_window_wsum_last(dog, win_s),
                              win_s) / sum_j2
    theta_y = _window_sum_last(_window_wsum_sub(dog, win_s),
                               win_s) / sum_j2
    theta_c = _window_sum_last(_window_sum_sub(dog, win_s),
                               win_s) / win_area
    n2_m = theta_x * theta_x + theta_y * theta_y
    denom = jnp.where(n2_m > 0, n2_m, 1.0)
    xs = -theta_x * theta_c / denom
    ys = -theta_y * theta_c / denom

    t3 = (jnp.abs(xs) <= 0.5) & (jnp.abs(ys) <= 0.5)
    t4 = n2_m >= jnp.square(grad_thresh * max_img_value * dog_thresh)
    interior = ((ii >= win_s) & (ii < H - win_s) &
                (jj >= win_s) & (jj < W - win_s))

    mask_ref[:] = (t1 & t2 & t3 & t4 & interior).astype(jnp.float32)
    tx_ref[:] = theta_x
    ty_ref[:] = theta_y
    xs_ref[:] = xs
    ys_ref[:] = ys
    n2_ref[:] = n2_m


@partial(jax.jit, static_argnames=("sigma0", "k_sigma", "box_n", "win_s",
                                   "per_hist", "dog_thresh",
                                   "max_img_value", "interpret"))
def detect_candidates_pallas(img: Array, grad_thresh: Array, *,
                             sigma0: float, k_sigma: float, box_n: int = 3,
                             win_s: int, per_hist: float, dog_thresh: float,
                             max_img_value: float, interpret: bool = False):
    """Fused frame -> EdgeCandidates (scale space + build_mask tests,
    reference iimage/iigauss/sspace + edge_finder::build_mask,
    src/mtracklib/sspace.cpp:52-85 + edge_finder.cpp:67-214).

    Returns the same EdgeCandidates pytree as
    kernels.edge_detect.detect_candidates(build_scale_space(img), ...),
    with one HBM frame read + six map writes instead of the unfused
    path's ~14 frame-sized HBM transfers."""
    from rebvo_tpu.kernels.edge_detect import EdgeCandidates
    if not jnp.issubdtype(img.dtype, jnp.floating):
        img = img.astype(jnp.float32)
    if img.ndim != 2:
        fn = partial(detect_candidates_pallas, sigma0=sigma0,
                     k_sigma=k_sigma, box_n=box_n, win_s=win_s,
                     per_hist=per_hist, dog_thresh=dog_thresh,
                     max_img_value=max_img_value, interpret=interpret)
        # broadcast a scalar/unbatched grad_thresh across the image's
        # leading batch axes instead of vmapping it with in_axes=0
        thresh_b = jnp.broadcast_to(jnp.asarray(grad_thresh, jnp.float32),
                                    img.shape[:-2])
        for _ in range(img.ndim - 2):
            fn = jax.vmap(fn)
        return fn(img, thresh_b)
    sizes0, sizes1, _, _ = scale_space_plan(sigma0, k_sigma, box_n)
    H, W = img.shape
    shape = jax.ShapeDtypeStruct((H, W), jnp.float32)
    thresh = jnp.asarray(grad_thresh, jnp.float32).reshape(1, 1)
    outs = pl.pallas_call(
        partial(_detect_kernel, tuple(sizes0), tuple(sizes1), win_s,
                per_hist, dog_thresh, max_img_value),
        out_shape=(shape,) * 6,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 6,
        cost_estimate=pl.CostEstimate(
            flops=90 * H * W, bytes_accessed=7 * H * W * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(img, thresh)
    return EdgeCandidates(mask=outs[0] > 0, theta_x=outs[1],
                          theta_y=outs[2], xs=outs[3], ys=outs[4],
                          n2_m=outs[5])


@partial(jax.jit, static_argnames=("sigma0", "k_sigma", "box_n", "interpret"))
def build_scale_space_pallas(img: Array, sigma0: float, k_sigma: float,
                             box_n: int = 3, interpret: bool = False
                             ) -> ScaleSpace:
    """Drop-in fused replacement for scale_space.build_scale_space.

    `img` is [H, W] float32 (leading batch axes handled by vmap at the
    caller). `interpret=True` runs the Pallas interpreter (CPU tests).
    """
    if not jnp.issubdtype(img.dtype, jnp.floating):
        img = img.astype(jnp.float32)
    if img.ndim != 2:
        fn = build_scale_space_pallas
        for _ in range(img.ndim - 2):
            fn = jax.vmap(fn, in_axes=(0, None, None, None, None))
        return fn(img, sigma0, k_sigma, box_n, interpret)
    sizes0, sizes1, _, _ = scale_space_plan(sigma0, k_sigma, box_n)
    H, W = img.shape
    shape = jax.ShapeDtypeStruct((H, W), jnp.float32)
    outs = pl.pallas_call(
        partial(_sspace_kernel, tuple(sizes0), tuple(sizes1)),
        out_shape=(shape,) * 5,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 5,
        cost_estimate=pl.CostEstimate(
            flops=30 * H * W, bytes_accessed=6 * H * W * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(img)
    return ScaleSpace(img0=outs[0], img1=outs[1], dog=outs[2],
                      dx=outs[3], dy=outs[4])
