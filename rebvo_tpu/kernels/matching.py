"""Keyline matching: forward transfer and directed epipolar search.

Re-implements edge_tracker's matching stack (reference
src/mtracklib/edge_tracker.cpp:158-436):

  * `forward_match` — FordwardMatch: depth transfer new <- old along the
    forward match ids set by the pose minimiser, front-surface (larger
    inverse depth) winning on double matches. The reference's sequential
    compare-and-overwrite becomes a scatter-max tournament.
  * `directed_matching` — per-keyline 1-D epipolar search on the old
    map's id-mask image: the data-dependent bidirectional walk becomes a
    fixed-size candidate ladder in the reference's exact priority order
    (alternating inward/outward from the prior displacement), with all
    acceptance tests evaluated in parallel and the first accepted
    candidate selected by argmax.

Pallas decision (round 3, 2026-08-19, TPU v5e measurements): a fused
Pallas kernel for the field-sampled matcher was ruled out on the same
ground as the TryVelRot field-gather kernel (commit 050451b) — the
ladder's field samples are arbitrary per-keyline flat gathers, which
Mosaic cannot lower ('Only 2D gather is supported'; per-lane row
indices must match the operand layout). The XLA path measures 0.20 ms
stand-alone, but inside the fused step XLA overlaps it with the other
stages: the whole step executes in 0.35 ms against a 0.72 ms sum of
individually-dispatched stages, so the stand-alone stage numbers are
dispatch-dominated and a kernel-level win would mostly vanish. The
bytes lower bound puts the stage at ~5% of HBM peak (profiling.py),
i.e. gather-latency-bound, the regime the TPU's vector memory cannot
address without expressible gathers (BENCH_r03 speed_of_light).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.frontend.state import KeylineMap

Array = jax.Array


# ---------------------------------------------------------------------------
# Forward matching (FordwardMatch, edge_tracker.cpp:380-436)
# ---------------------------------------------------------------------------


def forward_match(old: KeylineMap, new: KeylineMap,
                  m_id_f: Array) -> Tuple[KeylineMap, Array]:
    """Transfer depth old -> new along forward matches.

    `m_id_f` is the per-old-keyline forward match id (from the pose
    minimiser). On double matches the source with the larger inverse
    depth (the front surface) wins — the reference achieves this with an
    ordered overwrite + compare; here a scatter-max tournament on
    (rho, source-id) decides the winner associatively.

    Returns the updated new map and the number of matches.
    """
    K = old.K
    src_ok = old.valid & (m_id_f >= 0)
    tgt = jnp.where(src_ok, m_id_f, K)      # K = dropped

    # Tournament: max rho per target; ties broken by larger source index
    # (the reference's later-writer-wins on equal rho).
    neg = jnp.float32(-jnp.inf)
    best_rho = jnp.full((K,), neg, old.rho.dtype)
    best_rho = best_rho.at[tgt].max(jnp.where(src_ok, old.rho, neg),
                                    mode="drop")
    src_idx = jnp.arange(K, dtype=jnp.int32)
    is_best = src_ok & (old.rho == best_rho[jnp.minimum(tgt, K - 1)])
    winner = jnp.full((K,), -1, jnp.int32)
    winner = winner.at[jnp.where(is_best, tgt, K)].max(src_idx, mode="drop")

    has = winner >= 0
    w = jnp.maximum(winner, 0)

    g = lambda a: a[w]
    new2 = new._replace(
        rho=jnp.where(has, g(old.rho), new.rho),
        s_rho=jnp.where(has, g(old.s_rho), new.s_rho),
        m_num=jnp.where(has, g(old.m_num) + 1, new.m_num),
        m_id=jnp.where(has, winner, new.m_id),
        p0x=jnp.where(has, g(old.px), new.p0x),
        p0y=jnp.where(has, g(old.py), new.p0y),
        g0x=jnp.where(has, g(old.gx), new.g0x),
        g0y=jnp.where(has, g(old.gy), new.g0y),
        n_m0=jnp.where(has, g(old.n_m), new.n_m0),
        m_id_kf=jnp.where(has, g(old.m_id_kf), new.m_id_kf),
        # long-baseline scale-anchor identity (state.py ax/ay/arho)
        ax=jnp.where(has, g(old.ax), new.ax),
        ay=jnp.where(has, g(old.ay), new.ay),
        arho=jnp.where(has, g(old.arho), new.arho),
    )
    nmatch = jnp.sum(has & new.valid).astype(jnp.int32)
    return new2, nmatch


# ---------------------------------------------------------------------------
# Directed epipolar matching (search_match / directed_matching,
# edge_tracker.cpp:158-374)
# ---------------------------------------------------------------------------


class DirectedMatchResult(NamedTuple):
    new: KeylineMap
    nmatch: Array
    kf_matches: Array


@partial(jax.jit, static_argnames=(
    "width", "height", "max_steps", "min_thr_mod", "min_thr_ang",
    "max_radius", "loc_uncertainty"))
def directed_matching(
    new: KeylineMap,
    old: KeylineMap,
    old_mask: Array,               # [H, W] int32 id mask of the old map
    Vel: Array,                    # [3] estimated translation
    RVel: Array,                   # [3,3] translation covariance
    BackRot: Array,                # [3,3] back rotation (new -> old frame)
    *,
    zfm: Array,
    cx: Array,
    cy: Array,
    width: int,
    height: int,
    max_steps: int,
    min_thr_mod: float,
    min_thr_ang: float,
    max_radius: float,
    loc_uncertainty: float,
) -> DirectedMatchResult:
    """Match every new keyline against the old map along its epipolar
    displacement direction, cloning depth on success."""
    dt = new.x.dtype
    K = new.K
    cang_min = jnp.cos(jnp.deg2rad(jnp.asarray(min_thr_ang, dt)))

    # Back-rotate translation and its covariance (directed_matching,
    # edge_tracker.cpp:319-320).
    Vel = BackRot @ Vel
    RVel = BackRot @ RVel @ BackRot.T

    # Back-rotate the query keylines into the old frame.
    p3x = BackRot[0, 0] * new.px + BackRot[0, 1] * new.py + BackRot[0, 2] * zfm
    p3y = BackRot[1, 0] * new.px + BackRot[1, 1] * new.py + BackRot[1, 2] * zfm
    p3z = BackRot[2, 0] * new.px + BackRot[2, 1] * new.py + BackRot[2, 2] * zfm
    pmx = p3x * zfm / p3z
    pmy = p3y * zfm / p3z
    k_rho = new.rho * zfm / p3z

    pi0x = pmx + cx
    pi0y = pmy + cy

    # Displacement direction: t * rho = pixel displacement.
    t_x = -(Vel[0] * zfm - Vel[2] * pmx)
    t_y = -(Vel[1] * zfm - Vel[2] * pmy)
    norm_t0 = jnp.sqrt(t_x * t_x + t_y * t_y)

    # Displacement uncertainty along the reference's DrDv direction.
    DrDv = jnp.stack([jnp.full_like(pmx, zfm), jnp.full_like(pmx, zfm),
                      -pmx - pmy], axis=-1)                       # [K,3]
    sigma2_t = jnp.einsum("ki,ij,kj->k", DrDv, RVel, DrDv)

    moving = norm_t0 > 1e-6
    norm_t = jnp.where(moving, norm_t0, 1.0)
    inv_n = 1.0 / jnp.where(moving, norm_t0, 1.0)
    # Fallback direction: the keyline's own normal (edge_tracker.cpp:227).
    ux = jnp.where(moving, t_x * inv_n, new.gx / new.n_m)
    uy = jnp.where(moving, t_y * inv_n, new.gy / new.n_m)

    dq_rho_m = norm_t0 * k_rho
    dq_min_m = jnp.maximum(0.0, norm_t0 * (k_rho - new.s_rho)) - loc_uncertainty
    dq_max_m = jnp.minimum(max_radius, norm_t0 * (k_rho + new.s_rho)) + loc_uncertainty

    over = dq_rho_m > dq_max_m
    dq_rho_m = jnp.where(over, (dq_max_m + dq_min_m) * 0.5, dq_rho_m)
    t_steps_m = jnp.where(
        over,
        jnp.floor(dq_rho_m + 0.5),
        jnp.floor(jnp.maximum(dq_max_m - dq_rho_m, dq_rho_m - dq_min_m) + 0.5))

    dq_min = jnp.where(moving, dq_min_m, -max_radius - loc_uncertainty)
    dq_max = jnp.where(moving, dq_max_m, max_radius + loc_uncertainty)
    dq_rho = jnp.where(moving, dq_rho_m, 0.0)
    t_steps = jnp.where(moving, t_steps_m,
                        jnp.asarray(max_radius + loc_uncertainty, dt))

    # Candidate ladder in the reference's priority order:
    # step i, direction 0: t = dq_rho - i ; direction 1: t = dq_rho + 1 + i.
    i_idx = jnp.arange(max_steps, dtype=dt)                       # [S]
    cand_dn = dq_rho[:, None] - i_idx[None, :]                    # [K,S]
    cand_up = dq_rho[:, None] + 1.0 + i_idx[None, :]
    cand_t = jnp.stack([cand_dn, cand_up], axis=-1).reshape(K, -1)  # [K,2S]
    step_ok = (i_idx[None, :, None] < t_steps[:, None, None])
    dir_ok = jnp.stack(
        [cand_dn >= dq_min[:, None], cand_up <= dq_max[:, None]], axis=-1)
    cand_ok = (step_ok & dir_ok).reshape(K, -1)

    # Stage 1 — cheap: only the id-mask is gathered for the full ladder
    # (flat linear indices gather measurably faster than 2-D on TPU).
    qx = jnp.floor(ux[:, None] * cand_t + pi0x[:, None] + 0.5).astype(jnp.int32)
    qy = jnp.floor(uy[:, None] * cand_t + pi0y[:, None] + 0.5).astype(jnp.int32)
    inb = (qx >= 0) & (qx < width) & (qy >= 0) & (qy < height)
    lin = jnp.clip(qy, 0, height - 1) * width + jnp.clip(qx, 0, width - 1)
    j = jnp.where(cand_ok & inb, old_mask.reshape(-1)[lin], -1)    # [K,2S]

    # Stage 2 — the expensive per-candidate attribute tests run only on
    # the first `hit_cap` keyline hits along each ladder (edges are
    # sparse on the epipolar line, so nearly always every hit survives
    # into this shortlist; the reference walks serially and stops at the
    # first *accepted* hit). One top_k extracts the earliest hits.
    hit_cap = 12
    nc = j.shape[-1]
    hit = j >= 0
    prio = jnp.where(hit, nc - jnp.arange(nc, dtype=jnp.int32)[None, :], 0)
    top_val, sel_idx = jax.lax.top_k(prio, hit_cap)                # [K,H]
    sel_valid = top_val > 0
    rows = jnp.arange(K)
    j_sel = jnp.where(sel_valid,
                      jnp.take_along_axis(j, sel_idx, axis=-1), -1)  # [K,H]
    t_sel = jnp.take_along_axis(cand_t, sel_idx, axis=-1)
    j_safe = jnp.maximum(j_sel, 0)

    # Packed attribute gather: one [K_old, 8] row gather instead of five
    # scalar gathers (TPU-friendly contiguous rows).
    attrs = jnp.stack([old.gx, old.gy, old.n_m, old.rho, old.s_rho,
                       old.gx * 0, old.gx * 0, old.gx * 0], axis=-1)
    a_sel = attrs[j_safe]                                          # [K,H,8]
    o_gx = a_sel[..., 0]
    o_gy = a_sel[..., 1]
    o_nm = a_sel[..., 2]
    o_rho = a_sel[..., 3]
    o_srho = a_sel[..., 4]

    cang = (o_gx * new.gx[:, None] + o_gy * new.gy[:, None]) / (o_nm * new.n_m[:, None])
    grad_ok = (cang >= cang_min) & (jnp.abs(o_nm / new.n_m[:, None] - 1.0) <= min_thr_mod)

    v_rho_dr = (loc_uncertainty * loc_uncertainty
                + o_srho * o_srho * (norm_t * norm_t)[:, None]
                + sigma2_t[:, None] * o_rho * o_rho)
    consistent = jnp.square(t_sel - norm_t[:, None] * o_rho) <= v_rho_dr

    accept = (j_sel >= 0) & grad_ok & consistent & new.valid[:, None]
    any_acc = jnp.any(accept, axis=-1)
    first = jnp.argmax(accept, axis=-1)
    m_id = jnp.where(any_acc, j_sel[rows, first], -1)
    ms = jnp.maximum(m_id, 0)

    g = lambda a: a[ms]
    matched = any_acc
    new2 = new._replace(
        rho=jnp.where(matched, g(old.rho), new.rho),
        s_rho=jnp.where(matched, g(old.s_rho), new.s_rho),
        # clear=false semantics (the pipeline's call site): unmatched
        # keylines keep their forward-match state (edge_tracker.cpp:325).
        m_id=jnp.where(matched, m_id, new.m_id),
        m_num=jnp.where(matched, g(old.m_num) + 1, new.m_num),
        p0x=jnp.where(matched, g(old.px), new.p0x),
        p0y=jnp.where(matched, g(old.py), new.p0y),
        g0x=jnp.where(matched, g(old.gx), new.g0x),
        g0y=jnp.where(matched, g(old.gy), new.g0y),
        n_m0=jnp.where(matched, g(old.n_m), new.n_m0),
        m_id_kf=jnp.where(matched, g(old.m_id_kf), new.m_id_kf),
        ax=jnp.where(matched, g(old.ax), new.ax),
        ay=jnp.where(matched, g(old.ay), new.ay),
        arho=jnp.where(matched, g(old.arho), new.arho),
    )
    nmatch = jnp.sum(matched).astype(jnp.int32)
    kf_matches = jnp.sum(matched & (new2.m_id_kf >= 0)).astype(jnp.int32)
    return DirectedMatchResult(new=new2, nmatch=nmatch, kf_matches=kf_matches)


@partial(jax.jit, static_argnames=(
    "width", "height", "max_steps", "stride", "min_thr_mod", "min_thr_ang",
    "max_radius", "loc_uncertainty"))
def directed_matching_field(
    new: KeylineMap,
    old: KeylineMap,
    old_field: Array,              # [H, W] int32 match field of the old map
    Vel: Array,
    RVel: Array,
    BackRot: Array,
    *,
    zfm: Array,
    cx: Array,
    cy: Array,
    width: int,
    height: int,
    max_steps: int,
    stride: int,
    min_thr_mod: float,
    min_thr_ang: float,
    max_radius: float,
    loc_uncertainty: float,
) -> DirectedMatchResult:
    """Field-sampled variant of `directed_matching`.

    Instead of probing the old map's 1-px id mask at every ladder step,
    the ladder samples the old map's match FIELD (already built for the
    pose minimiser on the previous frame and carried in the VO state) at
    `stride`-pixel spacing: the field's painted normal bands make a
    coarse walk sufficient to hit any crossing edge, cutting the gather
    volume by the stride factor. The mask the reference probes is
    equally stale (it predates the forward rotation of the old map), so
    staleness semantics are unchanged. The chi^2 consistency test uses
    the matched keyline's exact projection onto the search line, not the
    sample position.
    """
    dt = new.x.dtype
    K = new.K
    cang_min = jnp.cos(jnp.deg2rad(jnp.asarray(min_thr_ang, dt)))

    Vel = BackRot @ Vel
    RVel = BackRot @ RVel @ BackRot.T

    p3x = BackRot[0, 0] * new.px + BackRot[0, 1] * new.py + BackRot[0, 2] * zfm
    p3y = BackRot[1, 0] * new.px + BackRot[1, 1] * new.py + BackRot[1, 2] * zfm
    p3z = BackRot[2, 0] * new.px + BackRot[2, 1] * new.py + BackRot[2, 2] * zfm
    pmx = p3x * zfm / p3z
    pmy = p3y * zfm / p3z
    k_rho = new.rho * zfm / p3z

    pi0x = pmx + cx
    pi0y = pmy + cy

    t_x = -(Vel[0] * zfm - Vel[2] * pmx)
    t_y = -(Vel[1] * zfm - Vel[2] * pmy)
    norm_t0 = jnp.sqrt(t_x * t_x + t_y * t_y)

    DrDv = jnp.stack([jnp.full_like(pmx, zfm), jnp.full_like(pmx, zfm),
                      -pmx - pmy], axis=-1)
    sigma2_t = jnp.einsum("ki,ij,kj->k", DrDv, RVel, DrDv)

    moving = norm_t0 > 1e-6
    norm_t = jnp.where(moving, norm_t0, 1.0)
    inv_n = 1.0 / jnp.where(moving, norm_t0, 1.0)
    ux = jnp.where(moving, t_x * inv_n, new.gx / new.n_m)
    uy = jnp.where(moving, t_y * inv_n, new.gy / new.n_m)

    dq_rho_m = norm_t0 * k_rho
    dq_min_m = jnp.maximum(0.0, norm_t0 * (k_rho - new.s_rho)) - loc_uncertainty
    dq_max_m = jnp.minimum(max_radius, norm_t0 * (k_rho + new.s_rho)) + loc_uncertainty
    over = dq_rho_m > dq_max_m
    dq_rho_m = jnp.where(over, (dq_max_m + dq_min_m) * 0.5, dq_rho_m)
    dq_min = jnp.where(moving, dq_min_m, -max_radius - loc_uncertainty)
    dq_max = jnp.where(moving, dq_max_m, max_radius + loc_uncertainty)
    dq_rho = jnp.where(moving, dq_rho_m, 0.0)

    # Strided ladder, near-first priority: +-stride*i from dq_rho.
    i_idx = jnp.arange(max_steps, dtype=dt) * stride
    cand_dn = dq_rho[:, None] - i_idx[None, :]
    cand_up = dq_rho[:, None] + i_idx[None, :] + 0.5 * stride
    cand_t = jnp.stack([cand_dn, cand_up], axis=-1).reshape(K, -1)
    pad = 0.5 * stride            # band sampling slack at the range ends
    cand_ok = (cand_t >= dq_min[:, None] - pad) & \
        (cand_t <= dq_max[:, None] + pad)

    qx = jnp.floor(ux[:, None] * cand_t + pi0x[:, None] + 0.5).astype(jnp.int32)
    qy = jnp.floor(uy[:, None] * cand_t + pi0y[:, None] + 0.5).astype(jnp.int32)
    inb = (qx >= 0) & (qx < width) & (qy >= 0) & (qy < height)
    lin = jnp.clip(qy, 0, height - 1) * width + jnp.clip(qx, 0, width - 1)
    j = jnp.where(cand_ok & inb, old_field.reshape(-1)[lin], -1)

    hit_cap = 8
    nc = j.shape[-1]
    hit = j >= 0
    prio = jnp.where(hit, nc - jnp.arange(nc, dtype=jnp.int32)[None, :], 0)
    top_val, sel_idx = jax.lax.top_k(prio, hit_cap)
    sel_valid = top_val > 0
    rows = jnp.arange(K)
    j_sel = jnp.where(sel_valid,
                      jnp.take_along_axis(j, sel_idx, axis=-1), -1)
    j_safe = jnp.maximum(j_sel, 0)

    attrs = jnp.stack([old.gx, old.gy, old.n_m, old.rho, old.s_rho,
                       old.x, old.y, old.gx * 0], axis=-1)
    a_sel = attrs[j_safe]
    o_gx = a_sel[..., 0]
    o_gy = a_sel[..., 1]
    o_nm = a_sel[..., 2]
    o_rho = a_sel[..., 3]
    o_srho = a_sel[..., 4]
    o_x = a_sel[..., 5]
    o_y = a_sel[..., 6]

    cang = (o_gx * new.gx[:, None] + o_gy * new.gy[:, None]) / \
        (o_nm * new.n_m[:, None])
    grad_ok = (cang >= cang_min) & \
        (jnp.abs(o_nm / new.n_m[:, None] - 1.0) <= min_thr_mod)

    # exact projection of the matched keyline onto the search line
    t_exact = (o_x - pi0x[:, None]) * ux[:, None] + \
        (o_y - pi0y[:, None]) * uy[:, None]
    range_ok = (t_exact >= dq_min[:, None]) & (t_exact <= dq_max[:, None])

    v_rho_dr = (loc_uncertainty * loc_uncertainty
                + o_srho * o_srho * (norm_t * norm_t)[:, None]
                + sigma2_t[:, None] * o_rho * o_rho)
    consistent = jnp.square(t_exact - norm_t[:, None] * o_rho) <= v_rho_dr

    accept = (j_sel >= 0) & grad_ok & range_ok & consistent & \
        new.valid[:, None]
    any_acc = jnp.any(accept, axis=-1)
    first = jnp.argmax(accept, axis=-1)
    m_id = jnp.where(any_acc, j_sel[rows, first], -1)
    ms = jnp.maximum(m_id, 0)

    g = lambda a: a[ms]
    matched = any_acc
    new2 = new._replace(
        rho=jnp.where(matched, g(old.rho), new.rho),
        s_rho=jnp.where(matched, g(old.s_rho), new.s_rho),
        m_id=jnp.where(matched, m_id, new.m_id),
        m_num=jnp.where(matched, g(old.m_num) + 1, new.m_num),
        p0x=jnp.where(matched, g(old.px), new.p0x),
        p0y=jnp.where(matched, g(old.py), new.p0y),
        g0x=jnp.where(matched, g(old.gx), new.g0x),
        g0y=jnp.where(matched, g(old.gy), new.g0y),
        n_m0=jnp.where(matched, g(old.n_m), new.n_m0),
        m_id_kf=jnp.where(matched, g(old.m_id_kf), new.m_id_kf),
        ax=jnp.where(matched, g(old.ax), new.ax),
        ay=jnp.where(matched, g(old.ay), new.ay),
        arho=jnp.where(matched, g(old.arho), new.arho),
    )
    nmatch = jnp.sum(matched).astype(jnp.int32)
    kf_matches = jnp.sum(matched & (new2.m_id_kf >= 0)).astype(jnp.int32)
    return DirectedMatchResult(new=new2, nmatch=nmatch, kf_matches=kf_matches)
