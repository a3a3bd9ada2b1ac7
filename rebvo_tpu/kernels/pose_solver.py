"""Frame-to-frame pose estimation by direct edge alignment.

Re-implements global_tracker's TryVelRot / Minimizer_RV and the
translation-only TryVel / Minimizer_V (reference
src/mtracklib/global_tracker.cpp:285-1093) as batched device kernels:

  * the per-keyline residual is a gather into the match-field image plus
    a normal-direction distance to the matched keyline, with the
    reference's gradient-similarity gate (Test_f_k, global_tracker.h:89)
    and per-point noise shaping q_rho = sqrt((s_rho * df/dv)^2 + 1)
    (global_tracker.cpp:452-463);
  * the 6-dof Jacobian is assembled analytically (the reference builds it
    from NE10 vector ops with post-hoc sign fixes; here the signs are
    derived directly from the left-perturbation model d(Rp)/dw = -[Rp]x);
  * JtJ / JtF are [K,6]^T [K,6] contractions (MXU-friendly);
  * the Levenberg-Marquardt loop keeps the reference's structure: double
    warm-start (zero init and prior init, no reweighting), then
    `iter_max` Huber-reweighted iterations with gain-ratio damping
    u *= max(0.33, 1 - (2g - 1)^3).

All shapes are static; the whole minimisation jits into one program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.core.geometry import so3_exp
from rebvo_tpu.frontend.state import KeylineMap

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


class FieldView(NamedTuple):
    """The data TryVelRot needs about the *new* edge-map (match targets)."""

    ikl: Array     # [H, W] int32 field image (build_field output)
    x: Array       # [K] new-map keyline data, gathered at match time
    y: Array
    ux: Array
    uy: Array
    gx: Array
    gy: Array
    n_m: Array

    @staticmethod
    def from_map(field_img: Array, klm: KeylineMap) -> "FieldView":
        return FieldView(ikl=field_img, x=klm.x, y=klm.y, ux=klm.ux,
                         uy=klm.uy, gx=klm.gx, gy=klm.gy, n_m=klm.n_m)


class TryVelRotResult(NamedTuple):
    score: Array      # total residual energy
    JtJ: Array        # [6, 6]
    JtF: Array        # [6]
    residual: Array   # [K] new distance residuals (next iteration's weights)
    m_id_f: Array     # [K] forward match ids into the new map (-1 = none)


def _rot2d_z(wz: Array):
    c = jnp.cos(wz)
    s = jnp.sin(wz)
    return c, s


def try_vel_rot(
    X: Array,                      # [6] state: [V; W]
    old: KeylineMap,               # old edge-map (points being aligned)
    fv: FieldView,                 # new edge-map's field
    prev_residual: Array,          # [K] distance residuals of last iteration
    *,
    zfm: Array,
    cx: Array,
    cy: Array,
    width: int,
    height: int,
    max_r: Array,                  # search radius (max residual)
    match_thresh: float,           # Test_f_k similarity threshold
    max_s_rho: Array,              # uncertainty cut-off (quantile)
    match_num_min: Array,          # min(MatchNumThresh, FrameCount)
    k_huber: float,
    reweight: bool,
) -> TryVelRotResult:
    """One residual/Jacobian evaluation (TryVelRot,
    global_tracker.cpp:285-543)."""
    dt = old.x.dtype
    V = X[:3]
    W = X[3:]
    R0 = so3_exp(W)

    # Old keylines as 3D points (Ne10::ProyI3Pto3PMatrix): padded slots
    # carry (0, 0, rho=1) like the reference's KltoI3PMatrix fill.
    rho_safe = jnp.where(old.valid, old.rho, 1.0)
    Z0 = 1.0 / rho_safe
    X0 = jnp.where(old.valid, old.px, 0.0) * Z0 / zfm
    Y0 = jnp.where(old.valid, old.py, 0.0) * Z0 / zfm

    # SE3 transform + projection.
    ptx = R0[0, 0] * X0 + R0[0, 1] * Y0 + R0[0, 2] * Z0 + V[0]
    pty = R0[1, 0] * X0 + R0[1, 1] * Y0 + R0[1, 2] * Z0 + V[1]
    ptz = R0[2, 0] * X0 + R0[2, 1] * Y0 + R0[2, 2] * Z0 + V[2]
    rho_p = 1.0 / ptz
    qx = ptx * zfm * rho_p          # hom coords of transformed point
    qy = pty * zfm * rho_p
    pix = qx + cx                   # image coords
    piy = qy + cy

    # Keyline usability gate (global_tracker.cpp:330-339).
    gated = (old.s_rho > max_s_rho) | (old.m_num < match_num_min) | (~old.valid)

    # Integer pixel (round2int_positive) + border test.
    xr = jnp.floor(pix + 0.5).astype(jnp.int32)
    yr = jnp.floor(piy + 0.5).astype(jnp.int32)
    oob = (xr < 1) | (yr < 1) | (xr >= width - 1) | (yr >= height - 1)

    # Field lookup.
    xs = jnp.clip(xr, 0, width - 1)
    ys = jnp.clip(yr, 0, height - 1)
    j = fv.ikl[ys, xs]
    j_safe = jnp.maximum(j, 0)
    no_kl = j < 0

    # Gradient-similarity gate with the z-rotated query gradient
    # (global_tracker.cpp:386-393 + Test_f_k).
    c, s = _rot2d_z(W[2])
    gmx = c * old.gx - s * old.gy
    gmy = s * old.gx + c * old.gy
    f_gx = fv.gx[j_safe]
    f_gy = fv.gy[j_safe]
    p_n2 = old.n_m * old.n_m
    p_esc = gmx * f_gx + gmy * f_gy
    grad_fail = jnp.abs(p_esc - p_n2) > match_thresh * p_n2

    miss = no_kl | grad_fail

    # Residual along the matched keyline's normal.
    dx = pix - fv.x[j_safe]
    dy = piy - fv.y[j_safe]
    fux = fv.ux[j_safe]
    fuy = fv.uy[j_safe]
    fi = dx * fux + dy * fuy

    matched = (~gated) & (~oob) & (~miss)

    # Huber reweighting from the previous iteration's residuals.
    if reweight:
        w_abs = jnp.abs(prev_residual)
        weight = jnp.where(w_abs > k_huber, k_huber / jnp.where(w_abs > 0, w_abs, 1.0), 1.0)
    else:
        weight = jnp.ones_like(old.x)

    dfx = jnp.where(matched, fux, 0.0)
    dfy = jnp.where(matched, fuy, 0.0)
    fm = jnp.where(gated, 0.0, jnp.where(matched, fi, max_r)) * weight
    dfx = dfx * weight
    dfy = dfy * weight

    new_residual = jnp.where(matched, fi, jnp.where(gated, prev_residual, max_r))
    m_id_f = jnp.where(matched, j, -1)

    # Per-point noise shaping (global_tracker.cpp:452-463).
    qvel = zfm * dfx * V[0] + zfm * dfy * V[1] + (qx * dfx + qy * dfy) * V[2]
    if reweight:
        q_rho = jnp.sqrt(jnp.square(old.s_rho * qvel) + 1.0)
    else:
        q_rho = jnp.where(old.s_rho > 0, old.s_rho, 1.0)
    inv_q = 1.0 / q_rho

    # Analytic Jacobian wrt [V; W] (left perturbation, signs derived —
    # equivalent to the reference's sign-corrected NE10 assembly,
    # global_tracker.cpp:497-516).
    a = rho_p * zfm * dfx
    b = rho_p * zfm * dfy
    ct = rho_p * (qx * dfx + qy * dfy)
    J = jnp.stack(
        [
            a,
            b,
            -ct,
            -b * ptz - ct * pty,
            a * ptz + ct * ptx,
            -a * pty + b * ptx,
        ],
        axis=-1,
    ) * inv_q[:, None]
    J = jnp.where(old.valid[:, None], J, 0.0)
    fms = jnp.where(old.valid, fm * inv_q, 0.0)

    JtJ = jnp.einsum("ki,kj->ij", J, J, precision=_HI)
    JtF = jnp.einsum("ki,k->i", J, fms, precision=_HI)
    score = jnp.sum(fms * fms)

    return TryVelRotResult(score=score, JtJ=JtJ, JtF=JtF,
                           residual=new_residual, m_id_f=m_id_f)


def _lm_damping_update(u, v, gain):
    fac = jnp.maximum(0.33, 1.0 - (2.0 * gain - 1.0) ** 3)
    u_acc = u * fac
    return u_acc, jnp.full_like(v, 2.0)


def _solve_lm(JtJ: Array, JtF: Array, u: Array) -> Array:
    A = JtJ + u * jnp.eye(JtJ.shape[0], dtype=JtJ.dtype)
    return jnp.linalg.solve(A, -JtF)


class MinimizerRVResult(NamedTuple):
    Vel: Array
    W0: Array
    RVel: Array       # covariance of V (slice of JtJ^-1)
    RW0: Array
    W_X: Array        # [6,6] information matrix (final JtJ)
    m_id_f: Array     # forward matches at the final state
    score: Array
    rel_error: Array
    rel_error_score: Array


@partial(jax.jit, static_argnames=(
    "width", "height", "match_thresh", "k_huber", "iter_max", "init_iter",
    "init_type"))
def minimizer_rv(
    Vel: Array, W0: Array,
    old: KeylineMap, fv: FieldView,
    *,
    zfm: Array, cx: Array, cy: Array, width: int, height: int,
    max_r: Array, match_thresh: float, max_s_rho: Array,
    match_num_min: Array, k_huber: float,
    iter_max: int, init_iter: int, init_type: int = 2,
) -> MinimizerRVResult:
    """Levenberg-Marquardt over [V; W] (Minimizer_RV,
    global_tracker.cpp:578-819), priors disabled as in the reference's
    vision-only call path (rebvo_second_t.cpp:343)."""
    dt = old.x.dtype
    K = old.K
    tau = jnp.asarray(1e-3, dt)

    kw = dict(zfm=zfm, cx=cx, cy=cy, width=width, height=height,
              max_r=max_r, match_thresh=match_thresh, max_s_rho=max_s_rho,
              match_num_min=match_num_min, k_huber=k_huber)

    def ev(X, res, reweight):
        return try_vel_rot(X, old, fv, res, reweight=reweight, **kw)

    zero_res = jnp.zeros((K,), dt)

    def warm_start(X0):
        """init_iter no-reweight LM iterations from X0; returns (X, F, res)."""
        r = ev(X0, zero_res, False)
        F = r.score
        JtJ, JtF = r.JtJ, r.JtF
        u = tau * jnp.max(JtJ)
        v = jnp.asarray(2.0, dt)
        X = X0
        res = r.residual
        eff = jnp.zeros((), jnp.int32)
        for _ in range(init_iter):
            h = _solve_lm(JtJ, JtF, u)
            Xn = X + h
            rn = ev(Xn, zero_res, False)
            gain = (F - rn.score) / (0.5 * jnp.dot(h, u * h - JtF))
            acc = gain > 0
            X = jnp.where(acc, Xn, X)
            F = jnp.where(acc, rn.score, F)
            JtJ = jnp.where(acc, rn.JtJ, JtJ)
            JtF = jnp.where(acc, rn.JtF, JtF)
            res = jnp.where(acc, rn.residual, res)
            u_acc, v_acc = _lm_damping_update(u, v, gain)
            u = jnp.where(acc, u_acc, u * v)
            v = jnp.where(acc, v_acc, v * 2.0)
            eff = eff + acc.astype(jnp.int32)
        return X, F, res, eff

    prior_X = jnp.concatenate([Vel, W0])
    if init_type == 0:
        X = jnp.zeros((6,), dt)
        res0 = zero_res
        eff0 = jnp.zeros((), jnp.int32)
    elif init_type == 1:
        X = prior_X
        res0 = zero_res
        eff0 = jnp.zeros((), jnp.int32)
    else:
        Xa, Fa, resa, _ = warm_start(jnp.zeros((6,), dt))
        Xb, Fb, resb, effb = warm_start(prior_X)
        use_b = Fb <= Fa
        X = jnp.where(use_b, Xb, Xa)
        res0 = jnp.where(use_b, resb, resa)
        eff0 = jnp.zeros((), jnp.int32)

    # Reweighted phase.
    r = ev(X, res0, True)
    F0 = r.score
    F = r.score
    JtJ, JtF = r.JtJ, r.JtF
    res = r.residual
    m_id_f = r.m_id_f
    u = tau * jnp.max(JtJ)
    v = jnp.asarray(2.0, dt)
    eff = eff0
    h = jnp.zeros((6,), dt)
    prev_res = res0
    for _ in range(iter_max):
        h_new = _solve_lm(JtJ, JtF, u)
        Xn = X + h_new
        rn = ev(Xn, prev_res, True)
        gain = (F - rn.score) / (0.5 * jnp.dot(h_new, u * h_new - JtF))
        acc = gain > 0
        X = jnp.where(acc, Xn, X)
        F = jnp.where(acc, rn.score, F)
        JtJ = jnp.where(acc, rn.JtJ, JtJ)
        JtF = jnp.where(acc, rn.JtF, JtF)
        prev_res = jnp.where(acc, rn.residual, prev_res)
        m_id_f = jnp.where(acc, rn.m_id_f, m_id_f)
        u_acc, v_acc = _lm_damping_update(u, v, gain)
        u = jnp.where(acc, u_acc, u * v)
        v = jnp.where(acc, v_acc, v * 2.0)
        eff = eff + acc.astype(jnp.int32)
        h = jnp.where(acc, h_new, h)

    RRV = jnp.linalg.inv(JtJ)
    any_eff = eff > 0
    rel_error = jnp.where(
        any_eff, jnp.linalg.norm(h) / (jnp.linalg.norm(X) + 1e-30), 1e20)
    rel_error_score = jnp.where(any_eff, F / jnp.where(F0 > 0, F0, 1.0), 1e20)

    return MinimizerRVResult(
        Vel=X[:3], W0=X[3:], RVel=RRV[:3, :3], RW0=RRV[3:, 3:], W_X=JtJ,
        m_id_f=m_id_f, score=F, rel_error=rel_error,
        rel_error_score=rel_error_score)
