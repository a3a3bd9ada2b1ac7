"""Stereo keyline matching and depth.

Re-implements edge_tracker's stereo path (reference
src/mtracklib/edge_tracker.cpp:453-688): epipolar search of each cam0
keyline along its projected depth-range segment in the cam1 edge map,
with two-candidate ambiguity rejection; closed-form inverse depth from
the matched pair; information-weighted fusion with the mono EKF depth.

Vectorised with the same two-stage ladder as directed matching: the full
candidate ladder gathers only the id mask, the attribute tests run on a
shortlist of hits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rebvo_tpu.frontend.state import RHO_INIT, RHO_MAX, RHO_MIN, KeylineMap

Array = jax.Array


class StereoMatchResult(NamedTuple):
    klm: KeylineMap       # cam0 map with stereo_rho/s fused fields set
    stereo_m_id: Array    # [K] match ids into the cam1 map (-1 = none)
    stereo_rho: Array     # [K] stereo inverse depth
    stereo_s_rho: Array   # [K]
    nmatch: Array


def stereo_depth(px0, py0, ux1, uy1, pm1x, pm1y, R01, t01, zf0, zf1,
                 loc_uncertainty):
    """Closed-form inverse depth of a matched pair
    (getDepthFromStereo, edge_tracker.cpp:623-668). Returns (rho, I_rho).
    """
    qh = jnp.stack([px0 / zf0, py0 / zf0, jnp.ones_like(px0)])
    qh1 = R01 @ qh                                       # [3, K]
    div = ux1 * (zf1 * t01[0] - pm1x * t01[2]) + \
        uy1 * (zf1 * t01[1] - pm1y * t01[2])
    mul = -ux1 * (zf1 * qh1[0] - pm1x * qh1[2]) - \
        uy1 * (zf1 * qh1[1] - pm1y * qh1[2])
    rho = mul / jnp.where(jnp.abs(div) > 1e-12, div, 1e-12)

    den = jnp.square(qh1[2] + t01[2] * rho)
    den = jnp.where(den > 1e-12, den, 1e-12)
    df = ux1 * zf1 * (t01[0] * (qh1[2] + t01[2] * rho) -
                      t01[2] * (qh1[0] + t01[0] * rho)) / den + \
        uy1 * zf1 * (t01[1] * (qh1[2] + t01[2] * rho) -
                     t01[2] * (qh1[1] + t01[1] * rho)) / den
    I_rho = jnp.square(df / loc_uncertainty)
    bad = ~(jnp.isfinite(rho) & jnp.isfinite(df))
    rho = jnp.where(bad, 1.0, rho)
    I_rho = jnp.where(bad, 1e-10, I_rho)
    return rho, I_rho


@partial(jax.jit, static_argnames=(
    "width", "height", "max_steps", "min_thr_mod", "min_thr_ang",
    "max_radius", "loc_uncertainty", "prior_window"))
def directed_matching_stereo(
    klm0: KeylineMap,            # cam0 map (queries)
    klm1: KeylineMap,            # cam1 map (targets)
    mask1: Array,                # [H, W] cam1 id mask
    t01: Array,                  # [3] cam0 -> cam1 translation
    R01: Array,                  # [3,3] cam0 -> cam1 rotation
    *,
    zf0: Array, zf1: Array, cx1: Array, cy1: Array,
    width: int, height: int, max_steps: int,
    min_thr_mod: float, min_thr_ang: float, max_radius: float,
    loc_uncertainty: float, prior_window: bool = False,
) -> StereoMatchResult:
    dt = klm0.x.dtype
    K = klm0.K
    cang_min = jnp.cos(jnp.deg2rad(jnp.asarray(min_thr_ang, dt)))

    if prior_window:
        # Reference behaviour: depth-range segment endpoints from the
        # mono prior's +-sigma band (edge_tracker.cpp:520-537). Once the
        # mono EKF converges, the band collapses to ~+-2 px around the
        # PRIOR depth and any edge inside it "confirms" whatever gauge
        # the prior has — self-confirming wrong matches that hold the
        # whole system at an arbitrary gauge (the reference's stereo
        # never recovers metric scale: PARITY_r04 align_scale 12.1).
        min_rho = jnp.clip(klm0.rho - klm0.s_rho, RHO_MIN, RHO_MAX)
        max_rho = jnp.clip(klm0.rho + klm0.s_rho, RHO_MIN, RHO_MAX)
    else:
        # Prior-free search (the default, beyond the reference): walk
        # the FULL disparity range; the two-candidate ambiguity
        # rejection below is the guard against repeated texture. A
        # keyline that cannot be matched unambiguously is simply not
        # pair-anchored this frame — the mono EKF carries it — while
        # every anchored depth is a prior-independent METRIC measurement
        # of the 3D point, which is what lets the pair baseline pin the
        # global gauge.
        min_rho = jnp.full_like(klm0.rho, RHO_MIN)
        max_rho = jnp.full_like(klm0.rho, RHO_MAX)

    def proj1(rho):
        z = 1.0 / rho
        X = klm0.px * z / zf0
        Y = klm0.py * z / zf0
        Px = R01[0, 0] * X + R01[0, 1] * Y + R01[0, 2] * z + t01[0]
        Py = R01[1, 0] * X + R01[1, 1] * Y + R01[1, 2] * z + t01[1]
        Pz = R01[2, 0] * X + R01[2, 1] * Y + R01[2, 2] * z + t01[2]
        Pz = jnp.where(jnp.abs(Pz) > 1e-9, Pz, 1e-9)
        return Px * zf1 / Pz, Py * zf1 / Pz

    qminx, qminy = proj1(min_rho)
    qmaxx, qmaxy = proj1(max_rho)
    dqx = qmaxx - qminx
    dqy = qmaxy - qminy
    norm_t = jnp.sqrt(dqx * dqx + dqy * dqy)
    moving = norm_t > 1e-6
    tx = jnp.where(moving, dqx / jnp.where(moving, norm_t, 1.0),
                   klm0.gx / klm0.n_m)
    ty = jnp.where(moving, dqy / jnp.where(moving, norm_t, 1.0),
                   klm0.gy / klm0.n_m)
    dq_min = jnp.where(moving, -loc_uncertainty,
                       -max_radius / 2 - loc_uncertainty)
    dq_max = jnp.where(moving,
                       jnp.minimum(max_radius, norm_t + loc_uncertainty),
                       max_radius / 2 + loc_uncertainty)
    pi0x = qminx + cx1
    pi0y = qminy + cy1

    # Integer ladder t = dq_min .. dq_max (edge_tracker.cpp:553: int t).
    steps = jnp.arange(max_steps, dtype=dt)
    cand_t = jnp.floor(dq_min)[:, None] + steps[None, :]
    cand_ok = (cand_t >= dq_min[:, None]) & (cand_t < dq_max[:, None]) & \
        klm0.valid[:, None]

    qx = jnp.floor(tx[:, None] * cand_t + pi0x[:, None] + 0.5).astype(jnp.int32)
    qy = jnp.floor(ty[:, None] * cand_t + pi0y[:, None] + 0.5).astype(jnp.int32)
    inb = (qx >= 0) & (qx < width) & (qy >= 0) & (qy < height)
    lin = jnp.clip(qy, 0, height - 1) * width + jnp.clip(qx, 0, width - 1)
    j = jnp.where(cand_ok & inb, mask1.reshape(-1)[lin], -1)

    # shortlist of first hits (prior-free search walks up to ~max_radius
    # px of texture, so keep enough slots that a second incompatible
    # edge further along the segment can still void the match)
    hit_cap = 16
    nc = j.shape[-1]
    hit = j >= 0
    prio = jnp.where(hit, nc - jnp.arange(nc, dtype=jnp.int32)[None, :], 0)
    top_val, sel_idx = jax.lax.top_k(prio, hit_cap)
    sel_valid = top_val > 0
    j_sel = jnp.where(sel_valid, jnp.take_along_axis(j, sel_idx, axis=-1), -1)
    j_safe = jnp.maximum(j_sel, 0)

    o_gx = klm1.gx[j_safe]
    o_gy = klm1.gy[j_safe]
    o_nm = klm1.n_m[j_safe]
    o_px = klm1.px[j_safe]
    o_py = klm1.py[j_safe]
    o_ux = klm1.ux[j_safe]
    o_uy = klm1.uy[j_safe]

    cang = (o_gx * klm0.gx[:, None] + o_gy * klm0.gy[:, None]) / \
        (o_nm * klm0.n_m[:, None])
    accept = (j_sel >= 0) & (cang >= cang_min) & \
        (jnp.abs(o_nm / klm0.n_m[:, None] - 1.0) <= min_thr_mod)

    # Two-candidate ambiguity rejection (edge_tracker.cpp:594-603): any
    # pair of accepted candidates further apart than loc_uncertainty in
    # hom position voids the match; otherwise the LAST accepted wins.
    big = jnp.asarray(1e9, dt)
    ax = jnp.where(accept, o_px, big)
    ay = jnp.where(accept, o_py, big)
    minx = jnp.min(jnp.where(accept, o_px, big), axis=-1)
    maxx = jnp.max(jnp.where(accept, o_px, -big), axis=-1)
    miny = jnp.min(jnp.where(accept, o_py, big), axis=-1)
    maxy = jnp.max(jnp.where(accept, o_py, -big), axis=-1)
    spread2 = jnp.square(maxx - minx) + jnp.square(maxy - miny)
    any_acc = jnp.any(accept, axis=-1)
    ambiguous = any_acc & (spread2 > loc_uncertainty * loc_uncertainty)

    last = (hit_cap - 1) - jnp.argmax(accept[:, ::-1], axis=-1)
    rows = jnp.arange(K)
    m_id = jnp.where(any_acc & (~ambiguous), j_sel[rows, last], -1)
    ms = jnp.maximum(m_id, 0)

    # Closed-form depth for the matched pairs.
    rho_st, I_rho = stereo_depth(
        klm0.px, klm0.py, klm1.ux[ms], klm1.uy[ms], klm1.px[ms],
        klm1.py[ms], R01, t01, zf0, zf1, loc_uncertainty)
    s_st = jax.lax.rsqrt(jnp.maximum(I_rho, 1e-12))
    neg = rho_st < 0
    m_id = jnp.where(neg, -1, m_id)
    rho_st = jnp.where(neg | (m_id < 0), RHO_INIT, rho_st)
    s_st = jnp.where(neg, 1e3, jnp.where(m_id < 0, RHO_MAX, s_st))

    nmatch = jnp.sum((m_id >= 0) & klm0.valid).astype(jnp.int32)
    return StereoMatchResult(klm=klm0, stereo_m_id=m_id, stereo_rho=rho_st,
                             stereo_s_rho=s_st, nmatch=nmatch)


def velocity_scale_refine(new: KeylineMap, old: KeylineMap, V: Array,
                          zfm, k_px: float = 1.0):
    """1-D refinement of the translation SCALE against the pair-anchored
    depths (beyond the reference; same 1-D-scale idea as its
    kfvo::optimizeScale, reference src/mtracklib/kfvo.cpp:222-303, but
    frame-to-frame and against metric pair depths).

    The field-gathered robust cost the 6-dof solver minimises is nearly
    flat in |V| at sub-pixel per-frame displacements (its residual is a
    nearest-edge distance, quantised by detection noise), so a shrunken
    translation survives LM. This instead uses the DIRECTED-MATCHING
    correspondences — true subpixel keyline-to-keyline displacements —
    restricted to pair-anchored (metric) depths, where the scale is a
    linear least-squares problem:

        q_i(sV) . u_i  ~=  q_i(0) . u_i + s * a_i,
        s* = sum w a_i b_i / sum w a_i^2,
        a_i = (q_i(V) - q_i(0)) . u_i   (predicted normal displacement)
        b_i = (q_meas_i - q_i(0)) . u_i (measured normal displacement)

    with 2 IRLS rounds (hard trim at k_px). `old` must already carry the
    frame rotation (the caller aligns maps before matching), so V is the
    only remaining motion. Returns (s, n_used); s = 1 when the problem
    is ill-conditioned (too few anchored matches or no excitation).
    """
    from rebvo_tpu.core.stats import masked_median

    dt = V.dtype
    j = new.m_id
    has = (j >= 0) & new.valid
    js = jnp.maximum(j, 0)
    # Regress against the PURE pair-geometry rho (KeylineMap.rho_st),
    # not the fused depth: once the mono EKF has converged its sigma
    # out-weighs the pair in the fusion, so the fused rho inherits any
    # mono gauge error and the refine would confirm it (measured: the
    # fused-rho regressor read b/a ~ 0.66 at the TRUE velocity).
    rho = old.rho_st[js]
    use = has & old.anchored[js] & old.valid[js] & (rho > RHO_MIN)

    rho = jnp.maximum(rho, RHO_MIN)
    Pz = 1.0 / rho
    Px = old.px[js] * Pz / zfm
    Py = old.py[js] * Pz / zfm
    q0x = old.px[js]
    q0y = old.py[js]
    tz = Pz + V[2]
    tz = jnp.where(jnp.abs(tz) > 1e-9, tz, 1e-9)
    qVx = (Px + V[0]) * zfm / tz
    qVy = (Py + V[1]) * zfm / tz
    ux = new.ux
    uy = new.uy
    a = (qVx - q0x) * ux + (qVy - q0y) * uy
    b = (new.px - q0x) * ux + (new.py - q0y) * uy

    # Median-of-ratios over the displacement-informative half: plain LS
    # (sum ab / sum a^2) is attenuated toward small s by the ~35%
    # per-keyline noise of the single-frame pair depth in the regressor
    # (errors-in-variables); the ratio median is robust to symmetric
    # multiplicative regressor noise AND to wrong-match outliers.
    abs_a = jnp.abs(a)
    a_med = masked_median(abs_a, use, fallback=0.0)
    inform = use & (abs_a > jnp.maximum(a_med, 0.02))
    ratio = b / jnp.where(abs_a > 1e-6, a, 1.0)
    s = masked_median(ratio, inform)
    # one trim round against the first estimate
    inl = inform & (jnp.abs(b - s * a) <= k_px)
    s = masked_median(ratio, inl, fallback=1.0)
    n_used = jnp.sum(inl).astype(jnp.int32)
    ok = (n_used > 20) & (s > 0.05) & (s < 50.0)
    return jnp.where(ok, s, 1.0), n_used


def anchor_scale_measure(klm: KeylineMap, aR: Array, aV: Array, zfm,
                         k_px: float = 2.5):
    """Long-baseline translation-scale measurement against per-keyline
    scale anchors (KeylineMap.ax/ay/arho; beyond the reference).

    velocity_scale_refine's per-frame signal saturates at the matcher's
    ~0.15 px noise floor — a 30% scale error on a 0.5 px/frame scene is
    invisible. Here each anchored keyline's position is predicted from
    its ANCHOR-epoch position (StereoScaleBaseFrames ago) through the
    accumulated motion (aR, aV): the translation-induced displacement is
    M times larger, so the scale s on aV is strongly observable:

        q(s) ~= q_rot + s * (q(1) - q_rot),
        a_i = (q(1) - q_rot) . u_i,  b_i = (q_meas - q_rot) . u_i,

    with q_rot the rotation-only projection (removes the rotation's
    displacement). Median-of-ratios + one trim round as in
    velocity_scale_refine. Returns (s, n_used)."""
    from rebvo_tpu.core.stats import masked_median

    dt = aV.dtype
    use = klm.valid & (klm.arho > RHO_MIN)
    rho = jnp.maximum(klm.arho, RHO_MIN)
    Pz = 1.0 / rho
    Px = klm.ax * Pz / zfm
    Py = klm.ay * Pz / zfm
    r0x = aR[0, 0] * Px + aR[0, 1] * Py + aR[0, 2] * Pz
    r0y = aR[1, 0] * Px + aR[1, 1] * Py + aR[1, 2] * Pz
    r0z = aR[2, 0] * Px + aR[2, 1] * Py + aR[2, 2] * Pz
    z0 = jnp.where(jnp.abs(r0z) > 1e-9, r0z, 1e-9)
    q0x = r0x * zfm / z0
    q0y = r0y * zfm / z0
    z1 = r0z + aV[2]
    z1 = jnp.where(jnp.abs(z1) > 1e-9, z1, 1e-9)
    q1x = (r0x + aV[0]) * zfm / z1
    q1y = (r0y + aV[1]) * zfm / z1

    a = (q1x - q0x) * klm.ux + (q1y - q0y) * klm.uy
    b = (klm.px - q0x) * klm.ux + (klm.py - q0y) * klm.uy

    # Full 6-dof relative-pose refinement over the metric anchors (a
    # normal-projected PnP). The pose solver trades translation against
    # rotation (their far-field image motions are nearly alike), so the
    # accumulated (aR, aV) carries compensating errors that a scale-only
    # regression cannot see (measured: scale-only read 0.99 while |aV|
    # was 31% short with GT-verified anchors), and a (scale, rotation)
    # solve still mis-reads forward motion whose DIRECTION is off.
    # Solving the full correction
    #     b_i - a_i = (J_t dt + J_w dw) . u_i
    # around the prediction identifies everything because the anchors
    # span 1.8-8 m of metric depth: rotation moves all of them alike,
    # translation moves them in proportion to rho. Only the resulting
    # translation-magnitude ratio |aV + dt| / |aV| feeds back.
    jx_wx = -q0x * q0y / zfm
    jx_wy = zfm + q0x * q0x / zfm
    jx_wz = -q0y
    jy_wx = -(zfm + q0y * q0y / zfm)
    jy_wy = q0x * q0y / zfm
    jy_wz = q0x
    # w columns scaled by 1/zf (x = zf*dw in px), t columns by the
    # median inverse depth (x = dt/med_depth in px) — conditions the
    # 6x6 normal system for f32
    c1 = (jx_wx * klm.ux + jy_wx * klm.uy) / zfm
    c2 = (jx_wy * klm.ux + jy_wy * klm.uy) / zfm
    c3 = (jx_wz * klm.ux + jy_wz * klm.uy) / zfm
    invz = 1.0 / jnp.where(jnp.abs(z1) > 1e-9, z1, 1e-9)
    rho_med = masked_median(rho, use, fallback=1.0)
    tsc = 1.0 / (zfm * jnp.maximum(rho_med, RHO_MIN))  # metres per unit x
    t1 = zfm * invz * klm.ux * tsc
    t2 = zfm * invz * klm.uy * tsc
    t3 = -(q1x * klm.ux + q1y * klm.uy) * invz * tsc
    A = jnp.stack([t1, t2, t3, c1, c2, c3], axis=-1)     # [K, 6]
    r0 = b - a

    w = use.astype(dt)
    x = jnp.zeros((6,), dt)
    for _ in range(3):
        Aw = A * w[:, None]
        AtA = Aw.T @ A + 1e-4 * jnp.eye(6, dtype=dt)
        Atb = Aw.T @ r0
        x = jnp.linalg.solve(AtA, Atb)
        resid = r0 - A @ x
        w = jnp.where(use & (jnp.abs(resid) <= k_px), 1.0, 0.0)
    dtv = x[:3] * tsc                 # undo column scaling -> metres
    t_new = aV + dtv
    s = jnp.linalg.norm(t_new) / jnp.maximum(jnp.linalg.norm(aV), 1e-12)
    n_used = jnp.sum(w > 0).astype(jnp.int32)
    # excitation guard: without enough translation signal the solve is
    # rotation-dominated
    sig = jnp.sum(w * a * a)
    ok = (n_used > 50) & (s > 0.05) & (s < 50.0) & (sig > 1.0)
    # median MEASURED displacement |b| — the caller's signal-strength
    # epoch gate (scenes differ 2x+ in px-per-frame; age-based epochs
    # give slow scenes too little signal and fast scenes too much lag).
    # Gating on the predicted |a| would be self-referential: an
    # underestimated velocity shrinks |a|, closes the gate, and locks
    # out its own correction.
    b_med = masked_median(jnp.abs(b), use, fallback=0.0)
    return jnp.where(ok, s, 1.0), n_used, b_med


def fuse_stereo_depth(klm: KeylineMap, stereo_m_id: Array, stereo_rho: Array,
                      stereo_s_rho: Array) -> KeylineMap:
    """Information-weighted product of the mono EKF depth and the stereo
    depth (fuseStereoDepth, edge_tracker.cpp:670-688); the mono estimate
    is backed up into rho0/s_rho0."""
    has = stereo_m_id >= 0
    s0 = klm.s_rho
    r0 = klm.rho
    i0 = 1.0 / jnp.square(jnp.maximum(s0, 1e-6))
    i1 = 1.0 / jnp.square(jnp.maximum(stereo_s_rho, 1e-6))
    s_new = jax.lax.rsqrt(i0 + i1)
    r_new = (r0 * i0 + stereo_rho * i1) * jnp.square(s_new)
    return klm._replace(
        rho0=r0, s_rho0=s0,
        rho=jnp.where(has & klm.valid, r_new, klm.rho),
        s_rho=jnp.where(has & klm.valid, s_new, klm.s_rho))
