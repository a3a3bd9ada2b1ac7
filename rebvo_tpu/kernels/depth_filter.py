"""Per-keyline inverse-depth filtering: EKF update, chain regularisation,
global rescaling, uncertainty quantile.

Re-implements edge_tracker's depth numerics (reference
src/mtracklib/edge_tracker.cpp:87-148, 695-834, 954-1186) as fused,
masked, batched elementwise ops over the KeylineMap SoA — the direct
TPU analogue of the reference's per-keyline scalar loops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.frontend.state import (RHO_INIT, RHO_MAX, RHO_MIN, KeylineMap)

Array = jax.Array


# ---------------------------------------------------------------------------
# Inverse-depth EKF (UpdateInverseDepthKalmanARLU, edge_tracker.cpp:954-1055)
# ---------------------------------------------------------------------------


def depth_ekf(klm: KeylineMap, vel: Array, zfm: Array, *,
              reshape_q_abs: float, loc_uncertainty: float) -> KeylineMap:
    """Batched scalar EKF on inverse depth, for matched keylines only.

    State: rho. Predict rho' = 1/(1/rho + v_z) with Jacobian
    F = (1/(1 + rho v_z))^2; measurement Y = u . (q - q0), model
    H = u . (v_xy zf - v_z q0); per the reference's active ARLU variant
    (the 6-source noise model at edge_tracker.cpp:732-834 is dormant
    there and not reproduced).
    """
    active = klm.valid & (klm.m_id >= 0)

    s_rho_prior = klm.s_rho
    v_rho = klm.s_rho * klm.s_rho
    u_x = klm.g0x / klm.n_m0
    u_y = klm.g0y / klm.n_m0

    Y = u_x * (klm.px - klm.p0x) + u_y * (klm.py - klm.p0y)
    H = u_x * (vel[0] * zfm - vel[2] * klm.p0x) + \
        u_y * (vel[1] * zfm - vel[2] * klm.p0y)

    rho_p = 1.0 / (1.0 / klm.rho + vel[2])
    F = 1.0 / (1.0 + klm.rho * vel[2])
    F2 = F * F
    p_p = F2 * v_rho * F2 + reshape_q_abs * reshape_q_abs

    e = Y - H * rho_p
    S = H * p_p * H + loc_uncertainty * loc_uncertainty
    Kk = p_p * H / S
    rho_new = rho_p + Kk * e
    s_new = jnp.sqrt((1.0 - Kk * H) * p_p)

    # Limit corrections (edge_tracker.cpp:1035-1055).
    below = rho_new < RHO_MIN
    s_new = jnp.where(below, s_new + (RHO_MIN - rho_new), s_new)
    rho_new = jnp.clip(rho_new, RHO_MIN, RHO_MAX)
    bad = (~jnp.isfinite(rho_new)) | (~jnp.isfinite(s_new)) | (s_new < 0)
    rho_new = jnp.where(bad, RHO_INIT, rho_new)
    s_new = jnp.where(bad, RHO_MAX, s_new)

    return klm._replace(
        rho=jnp.where(active, rho_new, klm.rho),
        s_rho=jnp.where(active, s_new, klm.s_rho),
        rho0=jnp.where(active, rho_p, klm.rho0),
        s_rho0=jnp.where(active, s_rho_prior, klm.s_rho0),
    )


# ---------------------------------------------------------------------------
# Chain regularisation (Regularize_1_iter, edge_tracker.cpp:87-148)
# ---------------------------------------------------------------------------


def regularize_1_iter(klm: KeylineMap, thresh: float) -> Tuple[KeylineMap, Array]:
    """One smoothing pass of (rho, s_rho) along edge chains: each keyline
    with both neighbours blends with them, weighted by gradient-angle
    agreement and sigma-consistency. Reads all neighbour values before
    writing (the reference stages results in temporaries too)."""
    K = klm.K
    has_nb = klm.valid & (klm.n_id >= 0) & (klm.p_id >= 0)
    ni = jnp.maximum(klm.n_id, 0)
    pi = jnp.maximum(klm.p_id, 0)

    rho_n, rho_p = klm.rho[ni], klm.rho[pi]
    s_n, s_p = klm.s_rho[ni], klm.s_rho[pi]

    sigma_ok = jnp.square(rho_n - rho_p) <= (s_n * s_n + s_p * s_p)

    alpha0 = (klm.gx[ni] * klm.gx[pi] + klm.gy[ni] * klm.gy[pi]) / \
        (klm.n_m[ni] * klm.n_m[pi])
    angle_ok = (alpha0 - thresh) >= 0
    alpha = (alpha0 - thresh) / (1.0 - thresh)
    alpha = alpha / (jnp.abs(rho_n - rho_p) / (s_n + s_p) + 1.0)

    wr = 1.0 / (klm.s_rho * klm.s_rho)
    wrn = alpha / (s_n * s_n)
    wrp = alpha / (s_p * s_p)
    wsum = wr + wrn + wrp
    r = (klm.rho * wr + rho_n * wrn + rho_p * wrp) / wsum
    s = (klm.s_rho * wr + s_n * wrn + s_p * wrp) / wsum

    apply = has_nb & sigma_ok & angle_ok
    out = klm._replace(rho=jnp.where(apply, r, klm.rho),
                       s_rho=jnp.where(apply, s, klm.s_rho))
    return out, jnp.sum(apply).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Global rescaling (EstimateReScalingOpt, edge_tracker.cpp:1104-1140)
# ---------------------------------------------------------------------------


def estimate_rescaling_opt(klm: KeylineMap, *, s_rho_min: float = RHO_MAX,
                           match_num_min: int = 1, apply: bool = False,
                           iters: int = 5) -> Tuple[KeylineMap, Array, Array]:
    """Iteratively estimated ratio Kp between updated and predicted
    inverse depth (weighted by the mixed variance s^2 + Kp^2 s0^2);
    returns (map, Kp, RKp) with the map rescaled when `apply`."""
    use = klm.valid & (klm.m_num >= match_num_min) & (klm.s_rho0 > 0) & \
        (klm.s_rho <= s_rho_min)
    rho2 = jnp.where(use, klm.rho * klm.rho, 0.0)
    rho02 = jnp.where(use, klm.rho0 * klm.rho0, 0.0)
    s2 = klm.s_rho * klm.s_rho
    s02 = klm.s_rho0 * klm.s_rho0

    Kp = jnp.ones((), klm.rho.dtype)
    RKp = jnp.ones((), klm.rho.dtype)
    for _ in range(iters):
        w = jnp.where(use, 1.0 / (s2 + Kp * Kp * s02), 0.0)
        rTr = jnp.sum(rho2 * w)
        rTr0 = jnp.sum(rho02 * w)
        Kp = jnp.where(rTr0 > 0, jnp.sqrt(rTr / jnp.where(rTr0 > 0, rTr0, 1.0)), 1.0)
        RKp = 1.0 / jnp.where(rTr0 > 0, rTr0, 1.0)

    # `apply` may be a traced bool (the bootstrap-rescale warm-up turns
    # it on dynamically for the first frames).
    if isinstance(apply, bool):
        div = Kp if apply else jnp.ones((), klm.rho.dtype)
    else:
        div = jnp.where(apply, Kp, 1.0)
    klm = klm._replace(rho=klm.rho / div, s_rho=klm.s_rho / div)
    return klm, Kp, RKp


# ---------------------------------------------------------------------------
# Uncertainty quantile (EstimateQuantile, edge_tracker.cpp:1148-1186)
# ---------------------------------------------------------------------------


def estimate_quantile(klm: KeylineMap, *, s_rho_min: float = RHO_MIN,
                      s_rho_max: float = RHO_MAX, percentile: float = 0.9,
                      nbins: int = 100) -> Array:
    """Histogram quantile of s_rho over the valid keylines; returns the
    uncertainty cut-off used to gate the pose minimiser."""
    kn = jnp.sum(klm.valid)
    span = s_rho_max - s_rho_min
    i = (nbins * (klm.s_rho - s_rho_min) / span).astype(jnp.int32)
    i = jnp.clip(i, 0, nbins - 1)
    i_eff = jnp.where(klm.valid, i, -1)
    hist = jnp.sum(i_eff[:, None] == jnp.arange(nbins)[None, :],
                   axis=0, dtype=jnp.int32)
    shifted = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(hist)[:-1]])
    reached = shifted.astype(jnp.float32) > percentile * kn
    idx = jnp.argmax(reached)
    found = jnp.any(reached)
    s = idx.astype(klm.s_rho.dtype) * span / nbins + s_rho_min
    return jnp.where(found, s, jnp.asarray(1e3, klm.s_rho.dtype))
