"""Edge detection: DoG zero-crossing keylines with subpixel refinement.

Re-implements the behaviour of edge_finder (reference
src/mtracklib/edge_finder.cpp:67-405) as fixed-shape vectorised image ops:

  * per-pixel candidate tests (gradient threshold, DoG sign balance,
    plane-fit zero crossing, DoG-gradient threshold) are separable window
    convolutions — the plane fit's pseudo-inverse collapses analytically
    to three weighted window sums because the regressor columns (j, i, 1)
    are mutually orthogonal over the symmetric window;
  * compaction of the variable keyline set into the fixed KeylineMap SoA
    uses a sized nonzero (raster order, matching the reference's scan
    order and its kl_max truncation);
  * edge-chain linking (join_edges / NextPoint, edge_finder.cpp:221-320)
    becomes a 3-way masked gather on the id mask plus a scatter-max for
    the back links (the reference's last-writer-wins overwrite).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.frontend.state import RHO_INIT, RHO_MAX, KeylineMap
from rebvo_tpu.kernels.scale_space import ScaleSpace

Array = jax.Array


def _shift2d(img: Array, di: int, dj: int) -> Array:
    """Zero-padded shift: out[y, x] = img[y + di, x + dj]."""
    H, W = img.shape[-2], img.shape[-1]
    pad = [(0, 0)] * (img.ndim - 2) + [
        (max(-di, 0), max(di, 0)),
        (max(-dj, 0), max(dj, 0)),
    ]
    p = jnp.pad(img, pad)
    y0 = max(di, 0)
    x0 = max(dj, 0)
    return p[..., y0:y0 + H, x0:x0 + W]


def _window_sum(img: Array, w: int) -> Array:
    """Unnormalised (2w+1)^2 window sum via separable shifts."""
    row = sum(_shift2d(img, 0, j) for j in range(-w, w + 1))
    return sum(_shift2d(row, i, 0) for i in range(-w, w + 1))


def _window_wsum_x(img: Array, w: int) -> Array:
    """Window sum weighted by the x-offset j (for the plane-fit slope)."""
    row = sum(float(j) * _shift2d(img, 0, j) for j in range(-w, w + 1) if j != 0)
    return sum(_shift2d(row, i, 0) for i in range(-w, w + 1))


def _window_wsum_y(img: Array, w: int) -> Array:
    col = sum(float(i) * _shift2d(img, i, 0) for i in range(-w, w + 1) if i != 0)
    return sum(_shift2d(col, 0, j) for j in range(-w, w + 1))


class EdgeCandidates(NamedTuple):
    mask: Array     # [H, W] bool — pixel passes every detector test
    theta_x: Array  # DoG plane gradient (keyline gradient m_m)
    theta_y: Array
    xs: Array       # subpixel offsets of the zero crossing
    ys: Array
    n2_m: Array     # squared DoG-gradient norm


def detect_candidates(ss: ScaleSpace, win_s: int, per_hist: float,
                      grad_thresh: Array, dog_thresh: float,
                      max_img_value: float) -> EdgeCandidates:
    """Per-pixel detector tests (edge_finder::build_mask,
    edge_finder.cpp:67-214), fully vectorised."""
    H, W = ss.dog.shape[-2:]
    win_area = float((2 * win_s + 1) ** 2)
    # sum of j^2 over the window: (2w+1) * sum_j j^2
    sum_j2 = float((2 * win_s + 1) * sum(j * j for j in range(-win_s, win_s + 1)))

    # Test 1: squared image-gradient norm against (thresh * max_val)^2.
    n2gI = ss.dx * ss.dx + ss.dy * ss.dy
    t1 = n2gI >= jnp.square(grad_thresh * max_img_value)

    # Test 2: DoG sign balance (non-max suppression surrogate).
    sign = jnp.where(ss.dog > 0, 1.0, -1.0)
    pn = _window_sum(sign, win_s)
    t2 = jnp.abs(pn) <= win_area * per_hist

    # Plane fit theta = pinv(Phi) @ Y with orthogonal regressors.
    theta_x = _window_wsum_x(ss.dog, win_s) / sum_j2
    theta_y = _window_wsum_y(ss.dog, win_s) / sum_j2
    theta_c = _window_sum(ss.dog, win_s) / win_area

    n2_m = theta_x * theta_x + theta_y * theta_y
    denom = jnp.where(n2_m > 0, n2_m, 1.0)
    xs = -theta_x * theta_c / denom
    ys = -theta_y * theta_c / denom

    # Test 3: zero crossing inside the pixel.
    t3 = (jnp.abs(xs) <= 0.5) & (jnp.abs(ys) <= 0.5)

    # Test 4: DoG-gradient threshold (proportional to the main one).
    t4 = n2_m >= jnp.square(grad_thresh * max_img_value * dog_thresh)

    # Interior-only scan window (edge_finder.cpp:105).
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    interior = (yy >= win_s) & (yy < H - win_s) & (xx >= win_s) & (xx < W - win_s)

    mask = t1 & t2 & t3 & t4 & interior
    return EdgeCandidates(mask=mask, theta_x=theta_x, theta_y=theta_y,
                          xs=xs, ys=ys, n2_m=n2_m)


def _neighbor_offsets(tx: Array, ty: Array):
    """NextPoint's quadrant-ordered 3-neighbour priority list
    (edge_finder.cpp:221-297). Returns ((dx1,dy1),(dx2,dy2),(dx3,dy3))."""
    up = ty > 0               # search toward +y
    right_up = tx > 0
    right_dn = tx >= 0
    dx_lat = jnp.where(up, jnp.where(right_up, 1, -1), jnp.where(right_dn, 1, -1))
    dy_fwd = jnp.where(up, 1, -1)
    z = jnp.zeros_like(dx_lat)
    return ((dx_lat, z), (z, dy_fwd), (dx_lat, dy_fwd))


@partial(jax.jit, static_argnames=("K", "kl_max", "win_s"))
def detect_keylines(
    ss: ScaleSpace,
    grad_thresh: Array,
    *,
    K: int,
    kl_max: int,
    win_s: int,
    per_hist: float,
    dog_thresh: float,
    max_img_value: float,
    cx: Array,
    cy: Array,
) -> Tuple[KeylineMap, Array, Array]:
    """Detect, compact and link keylines (edge_finder::detect).

    Returns (keyline map, id-mask image [H,W] int32, keyline count).
    """
    cand = detect_candidates(ss, win_s, per_hist, grad_thresh, dog_thresh,
                             max_img_value)
    return compact_keylines(cand, K=K, kl_max=kl_max, cx=cx, cy=cy)


@partial(jax.jit, static_argnames=("K", "kl_max"))
def compact_keylines(
    cand: EdgeCandidates,
    *,
    K: int,
    kl_max: int,
    cx: Array,
    cy: Array,
) -> Tuple[KeylineMap, Array, Array]:
    """Compact + chain-link precomputed detector candidates into the
    fixed keyline SoA (the back half of edge_finder::detect; the per-
    pixel tests may come from detect_candidates or the fused Pallas
    kernel, kernels/pallas_scale_space.detect_candidates_pallas)."""
    H, W = cand.mask.shape[-2:]
    flat = cand.mask.reshape(-1)
    (pix_idx,) = jnp.nonzero(flat, size=K, fill_value=0)
    total = jnp.sum(flat).astype(jnp.int32)
    n_keep = jnp.minimum(total, jnp.int32(min(kl_max, K)))
    slot = jnp.arange(K, dtype=jnp.int32)
    valid = slot < n_keep

    piy = (pix_idx // W).astype(jnp.int32)
    pix = (pix_idx % W).astype(jnp.int32)

    gather = lambda img: img.reshape(-1)[pix_idx]
    gx = gather(cand.theta_x)
    gy = gather(cand.theta_y)
    n2 = gather(cand.n2_m)
    n_m = jnp.sqrt(jnp.where(n2 > 0, n2, 1.0))
    ux = gx / n_m
    uy = gy / n_m
    x = pix.astype(gx.dtype) + gather(cand.xs)
    y = piy.astype(gx.dtype) + gather(cand.ys)
    px = x - cx
    py = y - cy

    # Id-mask image: keyline slot at its integer pixel, -1 elsewhere.
    drop = jnp.where(valid, pix_idx, H * W)  # out-of-range -> dropped
    mask_img = jnp.full((H * W,), -1, dtype=jnp.int32)
    mask_img = mask_img.at[drop].set(slot, mode="drop").reshape(H, W)

    # --- join_edges: next-id via quadrant gather, prev-id via scatter-max.
    rx = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
    ry = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
    tx = -gy
    ty = gx
    n_id = jnp.full((K,), -1, dtype=jnp.int32)
    found = jnp.zeros((K,), dtype=bool)
    for dxo, dyo in _neighbor_offsets(tx, ty):
        nx = rx + dxo
        ny = ry + dyo
        inb = (nx >= 0) & (nx < W) & (ny >= 0) & (ny < H)
        cand_id = jnp.where(inb, mask_img[jnp.clip(ny, 0, H - 1),
                                          jnp.clip(nx, 0, W - 1)], -1)
        take = (~found) & (cand_id >= 0)
        n_id = jnp.where(take, cand_id, n_id)
        found = found | (cand_id >= 0)
    n_id = jnp.where(valid, n_id, -1)

    p_id = jnp.full((K,), -1, dtype=jnp.int32)
    tgt = jnp.where((n_id >= 0) & valid, n_id, K)
    p_id = p_id.at[tgt].max(slot, mode="drop")

    dt = gx.dtype
    f0 = jnp.zeros((K,), dtype=dt)
    klm = KeylineMap(
        valid=valid,
        x=jnp.where(valid, x, 0), y=jnp.where(valid, y, 0),
        gx=jnp.where(valid, gx, 0), gy=jnp.where(valid, gy, 0),
        n_m=jnp.where(valid, n_m, 1.0),
        ux=jnp.where(valid, ux, 0), uy=jnp.where(valid, uy, 0),
        px=jnp.where(valid, px, 0), py=jnp.where(valid, py, 0),
        p0x=jnp.where(valid, px, 0), p0y=jnp.where(valid, py, 0),
        g0x=jnp.where(valid, gx, 0), g0y=jnp.where(valid, gy, 0),
        n_m0=jnp.where(valid, n_m, 1.0),
        rho=f0 + RHO_INIT, s_rho=f0 + RHO_MAX,
        rho0=f0 + RHO_INIT, s_rho0=f0 + RHO_MAX,
        m_num=jnp.zeros((K,), dtype=jnp.int32),
        m_id=jnp.full((K,), -1, dtype=jnp.int32),
        m_id_f=jnp.full((K,), -1, dtype=jnp.int32),
        m_id_kf=jnp.full((K,), -1, dtype=jnp.int32),
        p_id=p_id, n_id=n_id,
        anchored=jnp.zeros((K,), dtype=bool),
        rho_st=f0, ax=f0, ay=f0, arho=f0,
    )
    return klm, mask_img, n_keep


def update_detector_threshold(thresh: Array, last_kl_num: Array, kl_ref: int,
                              gain: float, thresh_max: float,
                              thresh_min: float) -> Array:
    """Proportional auto-threshold (UpdateThresh, edge_finder.cpp:330-335)."""
    if gain <= 0:
        return thresh
    t = thresh - gain * (kl_ref - last_kl_num.astype(thresh.dtype))
    return jnp.clip(t, thresh_min, thresh_max)


def re_estimate_thresh(klm: KeylineMap, knum: int, nbins: int) -> Array:
    """Histogram threshold keeping roughly the top-`knum` keylines by DoG
    gradient norm (edge_finder::reEstimateThresh, edge_finder.cpp:373-405).

    Faithfully reproduces the reference's walk, which accumulates bins
    1..i (its loop-increment comma expression skips bin 0).
    """
    n_m = klm.n_m
    valid = klm.valid
    neg_inf = jnp.asarray(-jnp.inf, n_m.dtype)
    pos_inf = jnp.asarray(jnp.inf, n_m.dtype)
    max_dog = jnp.max(jnp.where(valid, n_m, neg_inf))
    min_dog = jnp.min(jnp.where(valid, n_m, pos_inf))
    any_valid = jnp.any(valid)
    max_dog = jnp.where(any_valid, max_dog, 1.0)
    min_dog = jnp.where(any_valid, min_dog, 0.0)
    span = jnp.where(max_dog > min_dog, max_dog - min_dog, 1.0)

    i = jnp.clip((nbins * (max_dog - n_m) / span).astype(jnp.int32), 0, nbins - 1)
    # Comparison-matrix histogram: a [K, nbins] equality reduce is far
    # faster on the VPU than a K-element scatter-add.
    i_eff = jnp.where(valid, i, -1)
    hist = jnp.sum(i_eff[:, None] == jnp.arange(nbins)[None, :],
                   axis=0, dtype=jnp.int32)
    csum = jnp.cumsum(hist) - hist[0]          # sum of bins 1..i
    reached = csum >= knum
    i_star = jnp.where(jnp.any(reached), jnp.argmax(reached), nbins)
    return max_dog - i_star.astype(n_m.dtype) * span / nbins
