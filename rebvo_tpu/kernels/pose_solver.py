"""Frame-to-frame pose estimation by direct edge alignment.

Re-implements the behaviour of global_tracker's TryVelRot / Minimizer_RV
and the translation-only Minimizer_V (reference
src/mtracklib/global_tracker.cpp:285-1093) as batched device kernels:

  * the per-keyline residual is a gather into the match-field image plus
    a normal-direction distance to the matched keyline, with the
    reference's gradient-similarity gate (Test_f_k, global_tracker.h:89);
  * the 6-dof Jacobian is assembled analytically (the reference builds it
    from NE10 vector ops with post-hoc sign fixes; here the signs are
    derived directly from the left-perturbation model d(Rp)/dw = -[Rp]x);
  * JtJ / JtF are [K,6]^T [K,6] contractions (MXU-friendly);
  * the Levenberg-Marquardt driver keeps the reference's structure:
    double warm start (zero init and prior init), then the main loop with
    gain-ratio damping u *= max(0.33, 1 - (2g - 1)^3).

Scoring deviates deliberately from the reference, whose robust cost is
assembled from *lagged* Huber weights and a *state-dependent* noise model
(global_tracker.cpp:409-463). Both make consecutive LM score comparisons
inconsistent, with three measurable failure modes (reproduced in
tests/test_pose_solver.py's development history): converged maps veto
every step (new misses priced at max_r^2 vs k^2 for old ones), |V|-
inflating steps are spuriously rewarded (the noise grows with the state),
and pure forward motion is never recovered (border misses dominate).
Here the cost is a proper robust M-estimate, identical to the
reference's at its fixed point but history-free:

    score(X) = sum_i  0                      (gated)
             | min((f_i / q_i)^2, k^2)       (matched: capped quadratic)
             | k^2                           (miss = saturated outlier)

with Huber step weights from the *current* residuals and the noise shaping
q_i = sqrt((min(s_rho, 1) * qvel_i)^2 + 1) frozen once per frame at the
prior state (it is a noise model, not part of the state).
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
    """The data TryVelRot needs about the *new* edge-map (match targets).

    Per-keyline attributes are packed into one [K, 8] row matrix so a
    match lookup is a single contiguous row gather (TPU-friendly)
    instead of six scalar gathers.
    """

    ikl: Array     # [H, W] int32 field image (build_field output)
    attrs: Array   # [K, 8]: x, y, ux, uy, gx, gy, n_m, pad

    @staticmethod
    def from_map(field_img: Array, klm: KeylineMap) -> "FieldView":
        attrs = jnp.stack(
            [klm.x, klm.y, klm.ux, klm.uy, klm.gx, klm.gy, klm.n_m,
             jnp.zeros_like(klm.x)], axis=-1)
        return FieldView(ikl=field_img, attrs=attrs)


class TryVelRotResult(NamedTuple):
    score: Array      # total robust cost
    JtJ: Array        # [6, 6] IRLS normal matrix
    JtF: Array        # [6]    IRLS gradient (equals d(score/2)/dX)
    residual: Array   # [K] raw normal-distance residuals (diagnostic)
    m_id_f: Array     # [K] forward match ids into the new map (-1 = none)
    q_rho: Array      # [K] noise shaping evaluated at this state


def try_vel_rot(
    X: Array,                      # [6] state: [V; W]
    old: KeylineMap,               # old edge-map (points being aligned)
    fv: FieldView,                 # new edge-map's field
    q_frozen: Array = None,        # [K] per-frame noise shaping (or None)
    *,
    zfm: Array,
    cx: Array,
    cy: Array,
    width: int,
    height: int,
    max_r: Array,                  # kept for API parity (miss cost is k^2)
    match_thresh: float,           # Test_f_k similarity threshold
    max_s_rho: Array,              # uncertainty cut-off (quantile)
    match_num_min: Array,          # min(MatchNumThresh, FrameCount)
    k_huber: float,
    min_mod: Array = None,         # gradient-modulus gate (TryVel's
                                   # min_mod, global_tracker.cpp:851)
    vote_mask: Array = None,       # [K] bool — keylines allowed to VOTE
                                   # in the cost/Jacobian (stereo mode
                                   # restricts the vote to pair-anchored
                                   # depths; see KeylineMap.anchored).
                                   # Match determination (m_id_f) is
                                   # unaffected, so depth propagation
                                   # through forward matches stays whole.
) -> TryVelRotResult:
    """One robust residual/Jacobian evaluation (the reference's TryVelRot,
    global_tracker.cpp:285-543, with the self-consistent cost described in
    the module docstring)."""
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
    if min_mod is not None:
        gated = gated | (old.n_m < min_mod)

    # Integer pixel (round2int_positive) + border test.
    xr = jnp.floor(pix + 0.5).astype(jnp.int32)
    yr = jnp.floor(piy + 0.5).astype(jnp.int32)
    oob = (xr < 1) | (yr < 1) | (xr >= width - 1) | (yr >= height - 1)

    # Field lookup (flat indices + one packed attribute row gather).
    lin = jnp.clip(yr, 0, height - 1) * width + jnp.clip(xr, 0, width - 1)
    j = fv.ikl.reshape(-1)[lin]
    j_safe = jnp.maximum(j, 0)
    no_kl = j < 0
    fa = fv.attrs[j_safe]                     # [K, 8]

    # Gradient-similarity gate with the z-rotated query gradient
    # (global_tracker.cpp:386-393 + Test_f_k).
    c = jnp.cos(W[2])
    s = jnp.sin(W[2])
    gmx = c * old.gx - s * old.gy
    gmy = s * old.gx + c * old.gy
    f_gx = fa[:, 4]
    f_gy = fa[:, 5]
    p_n2 = old.n_m * old.n_m
    p_esc = gmx * f_gx + gmy * f_gy
    grad_fail = jnp.abs(p_esc - p_n2) > match_thresh * p_n2

    miss = no_kl | grad_fail

    # Residual along the matched keyline's normal.
    dx = pix - fa[:, 0]
    dy = piy - fa[:, 1]
    fux = fa[:, 2]
    fuy = fa[:, 3]
    fi = dx * fux + dy * fuy

    matched = (~gated) & (~oob) & (~miss)
    dfx = jnp.where(matched, fux, 0.0)
    dfy = jnp.where(matched, fuy, 0.0)

    # Noise shaping (global_tracker.cpp:452-463) with s_rho capped so a
    # bootstrap map (s_rho at RHO_MAX) does not suppress exactly the
    # motion-sensitive keylines.
    s_shape = jnp.minimum(old.s_rho, 1.0)
    qvel = zfm * dfx * V[0] + zfm * dfy * V[1] + (qx * dfx + qy * dfy) * V[2]
    q_self = jnp.sqrt(jnp.square(s_shape * qvel) + 1.0)
    q = q_self if q_frozen is None else q_frozen
    inv_q = 1.0 / q

    # Robust cost: capped quadratic min(r^2, k^2) — the fixed point of the
    # reference's squared lagged weights ((k/|r|)^2 * r^2 = k^2 for
    # outliers) is a redescending estimator whose outlier cost SATURATES;
    # a linear (Huber) tail would let far wrong matches outvote the
    # inliers. Outliers therefore contribute a constant and zero
    # gradient, identical to misses.
    r = jnp.where(matched, fi * inv_q, 0.0)
    abs_r = jnp.abs(r)
    k = jnp.asarray(k_huber, dt)
    inlier = matched & (abs_r <= k)
    cost_m = jnp.minimum(r * r, k * k)
    # Step weights are the capped cost's own IRLS weights (hard trim):
    # saturated matches have zero cost gradient, so they cast no vote.
    # (A Huber k/|r| tail was tried and measurably biases the steps —
    # systematic pull from crossing-line wrong matches.)
    w = jnp.where(inlier, 1.0, 0.0)

    cost = jnp.where(gated, 0.0, jnp.where(matched, cost_m, k * k))
    voter = old.valid if vote_mask is None else (old.valid & vote_mask)
    score = jnp.sum(jnp.where(voter, cost, 0.0))

    m_id_f = jnp.where(matched, j, -1)

    # Analytic Jacobian wrt [V; W] (left perturbation, signs derived —
    # equivalent to the reference's sign-corrected NE10 assembly,
    # global_tracker.cpp:497-516), scaled for IRLS: JtJ = J^T W J.
    a = rho_p * zfm * dfx
    b = rho_p * zfm * dfy
    ct = rho_p * (qx * dfx + qy * dfy)
    sw = jnp.sqrt(w) * inv_q
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
    ) * sw[:, None]
    J = jnp.where((voter & matched)[:, None], J, 0.0)
    fw = jnp.where(voter & matched, r * jnp.sqrt(w), 0.0)

    JtJ = jnp.einsum("ki,kj->ij", J, J, precision=_HI)
    JtF = jnp.einsum("ki,k->i", J, fw, precision=_HI)

    return TryVelRotResult(score=score, JtJ=JtJ, JtF=JtF,
                           residual=jnp.where(matched, fi, jnp.asarray(0.0, dt)),
                           m_id_f=m_id_f, q_rho=q_self)


def _lm_damping_update(u, v, gain):
    fac = jnp.maximum(0.33, 1.0 - (2.0 * gain - 1.0) ** 3)
    return u * fac, jnp.full_like(v, 2.0)


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
    vote_mask: Array = None,
) -> MinimizerRVResult:
    """Levenberg-Marquardt over [V; W] (the reference's Minimizer_RV,
    global_tracker.cpp:578-819; priors disabled as in its vision-only
    call path, rebvo_second_t.cpp:343). All phases share one robust cost
    with the noise shaping frozen at the prior state."""
    dt = old.x.dtype
    tau = jnp.asarray(1e-3, dt)

    kw = dict(zfm=zfm, cx=cx, cy=cy, width=width, height=height,
              max_r=max_r, match_thresh=match_thresh, max_s_rho=max_s_rho,
              match_num_min=match_num_min, k_huber=k_huber,
              vote_mask=vote_mask)

    prior_X = jnp.concatenate([Vel, W0])
    # Freeze the noise shaping at the prior state for the whole frame.
    q_frame = try_vel_rot(prior_X, old, fv, None, **kw).q_rho

    def ev(X):
        return try_vel_rot(X, old, fv, q_frame, **kw)

    def lm_phase(X0, n_iter, r0=None):
        r = ev(X0) if r0 is None else r0
        F_init = r.score
        F = r.score
        JtJ, JtF, m_id_f = r.JtJ, r.JtF, r.m_id_f
        u = tau * jnp.max(JtJ)
        v = jnp.asarray(2.0, dt)
        X = X0
        eff = jnp.zeros((), jnp.int32)
        h = jnp.zeros((6,), dt)
        for _ in range(n_iter):
            h_new = _solve_lm(JtJ, JtF, u)
            Xn = X + h_new
            rn = ev(Xn)
            gain = (F - rn.score) / (0.5 * jnp.dot(h_new, u * h_new - JtF))
            acc = gain > 0
            X = jnp.where(acc, Xn, X)
            F = jnp.where(acc, rn.score, F)
            JtJ = jnp.where(acc, rn.JtJ, JtJ)
            JtF = jnp.where(acc, rn.JtF, JtF)
            m_id_f = jnp.where(acc, rn.m_id_f, m_id_f)
            u_acc, v_acc = _lm_damping_update(u, v, gain)
            u = jnp.where(acc, u_acc, u * v)
            v = jnp.where(acc, v_acc, v * 2.0)
            eff = eff + acc.astype(jnp.int32)
            h = jnp.where(acc, h_new, h)
        return X, F, JtJ, JtF, m_id_f, eff, h, F_init

    if init_type == 0:
        X = jnp.zeros((6,), dt)
    elif init_type == 1:
        X = prior_X
    else:
        # Warm start over a CANDIDATE BATCH: the reference's two inits
        # (zero and prior, global_tracker.cpp:644-751) plus a velocity
        # scale ladder (2x/4x/8x the prior V). The ladder exists because
        # the robust edge-alignment cost has a known failure mode where
        # a shrunken translation is self-consistent with slightly-wrong
        # matches and becomes a local minimum; each rung is refined by a
        # short LM phase (so junk components of a scaled init don't mask
        # a good magnitude). All five candidates run as ONE vmapped LM
        # phase — batched gathers, same wall time as a single phase.
        cands = jnp.stack([jnp.zeros((6,), dt), prior_X])
        Xs, Fs = jax.vmap(
            lambda x0: lm_phase(x0, init_iter)[:2])(cands)
        # reference semantics between zero/prior: prior wins ties
        base_i = jnp.where(Fs[1] <= Fs[0], 1, 0)
        base_X = Xs[base_i]
        base_F = Fs[base_i]
        # Ladder rungs scale the REFINED base estimate's velocity (not
        # the raw prior): at bootstrap the prior is zero but the refined
        # zero-init already has the right direction at a shrunken
        # magnitude, which is exactly what the rungs recover.
        rungs = jnp.stack([base_X.at[:3].multiply(sc)
                           for sc in (2.0, 4.0, 8.0)])
        Xr, Fr = jax.vmap(lambda x0: lm_phase(x0, init_iter)[:2])(rungs)
        rung_i = jnp.argmin(Fr)
        # only on a clear (2%) win — alias guard against a large scaled
        # init matching the wrong texture line
        take = Fr[rung_i] < 0.98 * base_F
        X = jnp.where(take, Xr[rung_i], base_X)

    X, F, JtJ, JtF, m_id_f, eff, h, F0 = lm_phase(X, iter_max)

    RRV = jnp.linalg.inv(JtJ)
    any_eff = eff > 0
    rel_error = jnp.where(
        any_eff, jnp.linalg.norm(h) / (jnp.linalg.norm(X) + 1e-30), 1e20)
    rel_error_score = jnp.where(
        any_eff, F / jnp.where(F0 > 0, F0, 1.0), 1e20)

    return MinimizerRVResult(
        Vel=X[:3], W0=X[3:], RVel=RRV[:3, :3], RW0=RRV[3:, 3:], W_X=JtJ,
        m_id_f=m_id_f, score=F, rel_error=rel_error,
        rel_error_score=rel_error_score)


class MinimizerVResult(NamedTuple):
    Vel: Array
    RVel: Array       # 3x3 covariance
    m_id_f: Array
    score: Array


@partial(jax.jit, static_argnames=(
    "width", "height", "match_thresh", "k_huber", "iter_max"))
def minimizer_v(
    Vel: Array,
    old: KeylineMap, fv: FieldView,
    *,
    zfm: Array, cx: Array, cy: Array, width: int, height: int,
    max_r: Array, match_thresh: float, max_s_rho: Array,
    match_num_min: Array, k_huber: float, min_mod: Array,
    iter_max: int,
    vote_mask: Array = None,
) -> MinimizerVResult:
    """Translation-only LM (the reference's Minimizer_V / TryVel,
    global_tracker.cpp:829-1093) used on the IMU path after gyro
    pre-rotation; shares the robust evaluation with minimizer_rv,
    restricted to the V block."""
    dt = old.x.dtype
    tau = jnp.asarray(1e-3, dt)

    kw = dict(zfm=zfm, cx=cx, cy=cy, width=width, height=height,
              max_r=max_r, match_thresh=match_thresh, max_s_rho=max_s_rho,
              match_num_min=match_num_min, k_huber=k_huber, min_mod=min_mod,
              vote_mask=vote_mask)

    zeros3 = jnp.zeros((3,), dt)
    prior_X = jnp.concatenate([Vel, zeros3])
    q_frame = try_vel_rot(prior_X, old, fv, None, **kw).q_rho

    def ev(V):
        return try_vel_rot(jnp.concatenate([V, zeros3]), old, fv, q_frame,
                           **kw)

    def lm_phase(V0, n_iter):
        r = ev(V0)
        F = r.score
        JtJ = r.JtJ[:3, :3]
        JtF = r.JtF[:3]
        m_id_f = r.m_id_f
        u = tau * jnp.max(JtJ)
        v = jnp.asarray(2.0, dt)
        V = V0
        for _ in range(n_iter):
            h = _solve_lm(JtJ, JtF, u)
            Vn = V + h
            rn = ev(Vn)
            gain = (F - rn.score) / (0.5 * jnp.dot(h, u * h - JtF))
            acc = gain > 0
            V = jnp.where(acc, Vn, V)
            F = jnp.where(acc, rn.score, F)
            JtJ = jnp.where(acc, rn.JtJ[:3, :3], JtJ)
            JtF = jnp.where(acc, rn.JtF[:3], JtF)
            m_id_f = jnp.where(acc, rn.m_id_f, m_id_f)
            u_acc, v_acc = _lm_damping_update(u, v, gain)
            u = jnp.where(acc, u_acc, u * v)
            v = jnp.where(acc, v_acc, v * 2.0)
        return V, F, JtJ, JtF, m_id_f

    # Velocity scale ladder (see minimizer_rv): the robust cost has a
    # local minimum at a shrunken translation; refine the init, then
    # probe 2x/4x/8x copies of the REFINED estimate (which has a usable
    # direction even from a zero init at bootstrap) as one vmapped
    # batch, taking a rung only on a clear (2%) win (alias guard).
    V0, F0_, *_ = lm_phase(Vel, 2)
    rungs = jnp.stack([V0 * sc for sc in (2.0, 4.0, 8.0)])
    Vr, Fr = jax.vmap(lambda v0: lm_phase(v0, 2)[:2])(rungs)
    rung_i = jnp.argmin(Fr)
    take = Fr[rung_i] < 0.98 * F0_
    V = jnp.where(take, Vr[rung_i], V0)

    V, F, JtJ, JtF, m_id_f = lm_phase(V, iter_max)

    RVel = jnp.linalg.inv(JtJ)
    return MinimizerVResult(Vel=V, RVel=RVel, m_id_f=m_id_f, score=F)
