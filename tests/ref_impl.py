"""Slow, independent NumPy oracle implementations used only by tests.

These re-state the *behaviour* documented in SURVEY.md (integral-image
box filters with clipped borders, DoG plane fit, scalar depth EKF, ...)
in the most literal way possible, so the vectorised device kernels can be
checked against them on tiny inputs.
"""

from __future__ import annotations

import numpy as np


def box_filter_clipped(img: np.ndarray, d: int) -> np.ndarray:
    """Direct O(H*W*d^2) clipped box filter (oracle for iimage::average)."""
    H, W = img.shape
    d2 = d // 2
    out = np.zeros_like(img, dtype=np.float64)
    for y in range(H):
        for x in range(W):
            y0, y1 = max(y - d2, 0), min(y + d2, H - 1)
            x0, x1 = max(x - d2, 0), min(x + d2, W - 1)
            out[y, x] = img[y0:y1 + 1, x0:x1 + 1].sum() / ((y1 - y0 + 1) * (x1 - x0 + 1))
    return out


def gaussian_chain(img: np.ndarray, sizes) -> np.ndarray:
    out = img.astype(np.float64)
    for d in sizes:
        out = box_filter_clipped(out, d)
    return out


def detect_pixels(dog, dx, dy, win_s, per_hist, grad_thresh, dog_thresh,
                  max_img_value):
    """Oracle edge detector: loops every interior pixel, applies the four
    tests in order, returns list of (y, x, theta_x, theta_y, xs, ys)."""
    H, W = dog.shape
    area = (2 * win_s + 1) ** 2
    sum_j2 = (2 * win_s + 1) * sum(j * j for j in range(-win_s, win_s + 1))
    hits = []
    for y in range(win_s, H - win_s):
        for x in range(win_s, W - win_s):
            if dx[y, x] ** 2 + dy[y, x] ** 2 < (grad_thresh * max_img_value) ** 2:
                continue
            win = dog[y - win_s:y + win_s + 1, x - win_s:x + win_s + 1]
            pn = np.where(win > 0, 1, -1).sum()
            if abs(pn) > area * per_hist:
                continue
            jj = np.arange(-win_s, win_s + 1)
            tx = (win * jj[None, :]).sum() / sum_j2
            ty = (win * jj[:, None]).sum() / sum_j2
            tc = win.sum() / area
            n2 = tx * tx + ty * ty
            if n2 == 0:
                continue
            xs = -tx * tc / n2
            ys = -ty * tc / n2
            if abs(xs) > 0.5 or abs(ys) > 0.5:
                continue
            if n2 < (grad_thresh * max_img_value * dog_thresh) ** 2:
                continue
            hits.append((y, x, tx, ty, xs, ys))
    return hits


def depth_ekf_scalar(rho, s_rho, qx, qy, q0x, q0y, ux, uy, vel, zf,
                     reshape_q_abs, loc_uncert,
                     rho_min=1e-3, rho_max=20.0, rho_init=1.0):
    """Oracle for the per-keyline inverse-depth EKF
    (UpdateInverseDepthKalmanARLU semantics, SURVEY.md §2.3)."""
    v_rho = s_rho * s_rho
    Y = ux * (qx - q0x) + uy * (qy - q0y)
    H = ux * (vel[0] * zf - vel[2] * q0x) + uy * (vel[1] * zf - vel[2] * q0y)
    rho_p = 1.0 / (1.0 / rho + vel[2])
    F = 1.0 / (1.0 + rho * vel[2])
    F = F * F
    p_p = F * v_rho * F + reshape_q_abs ** 2
    e = Y - H * rho_p
    S = H * p_p * H + loc_uncert ** 2
    K = p_p * H / S
    rho_new = rho_p + K * e
    s_new = np.sqrt((1 - K * H) * p_p)
    if rho_new < rho_min:
        s_new += rho_min - rho_new
        rho_new = rho_min
    elif rho_new > rho_max:
        rho_new = rho_max
    if not np.isfinite(rho_new) or not np.isfinite(s_new) or s_new < 0:
        rho_new, s_new = rho_init, rho_max
    return rho_new, s_new, rho_p
