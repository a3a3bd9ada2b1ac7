"""Online keyframe-relative tracking inside the jitted step.

Re-implements the reference's per-frame TrackKeyFrames block (reference
src/rebvo/rebvo_second_t.cpp:429-444 and :591-596, kernels in
src/mtracklib/kfvo.cpp:739-1041):

  * keyframe->frame forward-match chains rebuilt each frame by composing
    KF->old with the inverted new->old back matches (buildForwardMatch,
    kfvo.cpp:739-771);
  * epipolar correction: each match slides along the partner map's edge
    chain to the (chain-local) minimum of distance to the epipolar line
    of the essential matrix between the keyframe and the current pose
    (stereoCorrect, kfvo.cpp:804-889);
  * augmentation: matches propagate along edge chains onto unmatched
    neighbours, then every match farther than `dist_thresh` from its
    epipolar line is pruned (correctAugmentate / forwardCorrectAugmentate,
    kfvo.cpp:893-1041);
  * keyframe switch when the surviving back-match count drops under
    min(TrackPoints, kl_num) * KFSavePercent (rebvo_second_t.cpp:591),
    with the reference's match resets (resetForwardMatch/resetKFMatch,
    kfvo.cpp:774-787).

TPU-first redesign: the reference's data-dependent chain walks become
fixed-step vectorised coordinate descent over the whole keyline batch
(gathers on the chain-link arrays), augmentation becomes bounded
parallel label propagation followed by a global epipolar prune — same
fixed point, no per-keyline loops. Everything is masked fixed-shape ops,
so the block vmaps with the rest of the step.

Beyond the reference (whose kfvo pose optimisers exist but are never
called by the pipeline), the maintained keyframe is actually *used*:
each frame the keyframe map is aligned to the current frame's match
field (backend/kfvo.align_to_keyframe, the Minimizer_RV_KF role,
kfvo.cpp:1677-1825) and, when the alignment is healthy, the global pose
re-anchors to the keyframe — bounding drift while a keyframe stays in
view instead of dead-reckoning frame-to-frame.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.core.geometry import skew
from rebvo_tpu.frontend.state import KeylineMap

Array = jax.Array

BIG_D = 1e9


class KFCarry(NamedTuple):
    """Device-resident active keyframe (the reference's kf_list.back()).

    `klm.m_id_f` holds the KF->current-frame forward matches; the
    current frame's `m_id_kf` holds the backward direction."""

    klm: KeylineMap
    Pose: Array        # [3,3] keyframe global rotation
    Pos: Array         # [3] keyframe global position
    count: Array       # int32 — keyframes pushed so far (0 = none yet)
    age: Array         # int32 — frames since this keyframe was pushed
                       # (scales the dead-reckoning drift budget of the
                       # re-anchor chi^2 gate)
    G: Array           # cumulative map-gauge factor at capture: the
                       # keyframe's rho lives in the map gauge of its
                       # capture frame (bootstrap gauge x G). Alignment
                       # translations are converted through it so the
                       # re-anchor never mixes gauges (the round-4 root
                       # cause of the KF-mode ATE regression: bootstrap
                       # moves the gauge ~4x in 20 frames, and an
                       # unconverted anchor imports that factor into the
                       # trajectory).

    @staticmethod
    def empty(K: int, dtype=jnp.float32) -> "KFCarry":
        return KFCarry(
            klm=KeylineMap.empty(K, dtype=dtype),
            Pose=jnp.eye(3, dtype=dtype),
            Pos=jnp.zeros((3,), dtype),
            count=jnp.zeros((), jnp.int32),
            age=jnp.zeros((), jnp.int32),
            G=jnp.ones((), dtype))


class KFTrackResult(NamedTuple):
    kf: KFCarry          # updated carry (possibly switched keyframe)
    klm: KeylineMap      # current map with corrected m_id_kf (and reset
                         # to identity if this frame became the keyframe)
    Pose: Array          # re-anchored global rotation
    Pos: Array           # re-anchored global position
    fow_m: Array         # int32 surviving KF->frame forward matches
    back_m: Array        # int32 surviving frame->KF backward matches
    saved: Array         # bool — this frame was pushed as a keyframe
    align_ok: Array      # bool — the KF alignment was used for the pose


def invert_matches(m_id: Array, valid: Array, K_old: int) -> Array:
    """fowMatch of buildForwardMatch (kfvo.cpp:742-753): for each OLD
    keyline, the index of the NEW keyline that back-matched to it
    (-1 = none; on double match the highest new index wins, matching the
    reference's last-writer-wins loop order)."""
    K_new = m_id.shape[-1]
    has = (m_id >= 0) & valid
    tgt = jnp.where(has, m_id, K_old)             # dump invalid in slot K
    inv = jnp.full((K_old + 1,), -1, jnp.int32)
    inv = inv.at[tgt].max(jnp.arange(K_new, dtype=jnp.int32))
    return inv[:K_old]


def build_forward_match(kf_m_id_f: Array, kf_valid: Array,
                        inv_old_to_new: Array) -> Array:
    """Re-point the keyframe's forward matches through the old->new
    inversion (buildForwardMatch, kfvo.cpp:755-766)."""
    safe = jnp.maximum(kf_m_id_f, 0)
    stepped = inv_old_to_new[safe]
    return jnp.where((kf_m_id_f >= 0) & kf_valid, stepped, -1)


def essential_matrix(R: Array, t: Array) -> Array:
    """E = R [t]x (kfvo.cpp:894-896)."""
    return R @ skew(t)


def _epipolar_dist(qx, qy, E, zfm, tgt_px, tgt_py):
    """Per-(query, candidate) distance of the candidate target keyline to
    the query's epipolar line (stereoCorrect core, kfvo.cpp:810-817).

    Returns a closure dist(j_idx) evaluating candidate slots."""
    ex = E[0, 0] * qx + E[0, 1] * qy + E[0, 2] * zfm
    ey = E[1, 0] * qx + E[1, 1] * qy + E[1, 2] * zfm
    ez = E[2, 0] * qx + E[2, 1] * qy + E[2, 2] * zfm
    n = jnp.sqrt(ex * ex + ey * ey)
    bad = n < 1e-12
    n = jnp.where(bad, 1.0, n)
    r0 = ex / n
    r1 = ey / n
    r2 = ez * zfm / n

    def dist(j):
        js = jnp.maximum(j, 0)
        d = jnp.abs(tgt_px[js] * r0 + tgt_py[js] * r1 + r2)
        return jnp.where((j >= 0) & (~bad), d, BIG_D)

    return dist


def chain_correct(qx: Array, qy: Array, m_id: Array, tgt: KeylineMap,
                  E: Array, zfm: float, steps: int) -> Tuple[Array, Array]:
    """Slide each match along the target map's edge chain (p_id/n_id) to
    a chain-local minimum of epipolar distance — the vectorised form of
    the reference's per-keyline while-walk (stereoCorrect,
    kfvo.cpp:820-885), with a fixed step budget instead of an unbounded
    loop. Returns (corrected m_id, final distance)."""
    dist = _epipolar_dist(qx, qy, E, zfm, tgt.px, tgt.py)

    def body(_, m):
        d0 = dist(m)
        ms = jnp.maximum(m, 0)
        nn = jnp.where(m >= 0, tgt.n_id[ms], -1)
        pp = jnp.where(m >= 0, tgt.p_id[ms], -1)
        dn = dist(nn)
        dp = dist(pp)
        go_n = (dn < d0) & (dn <= dp)
        go_p = (dp < d0) & (dp < dn)
        return jnp.where(go_n, nn, jnp.where(go_p, pp, m))

    m = jax.lax.fori_loop(0, steps, body, m_id)
    return m, dist(m)


def augment_matches(m_id: Array, src_p_id: Array, src_n_id: Array,
                    iters: int) -> Array:
    """Propagate matches along the SOURCE map's edge chains onto
    unmatched neighbours (the 'augmentate' halves of kfvo.cpp:920-1041),
    as bounded parallel label propagation; the caller re-corrects and
    prunes afterwards, which bounds any over-propagation exactly like
    the reference's per-step distance check."""
    def body(_, m):
        for link in (src_p_id, src_n_id):
            ls = jnp.maximum(link, 0)
            cand = jnp.where(link >= 0, m[ls], -1)
            m = jnp.where((m < 0) & (cand >= 0), cand, m)
        return m

    return jax.lax.fori_loop(0, iters, body, m_id)


def kf_relative_pose(kf: KFCarry, Pose: Array, Pos: Array):
    """(R, t) mapping keyframe camera points into the current frame:
    R = Pose^T kf.Pose, t = Pose^T (kf.Pos - Pos)."""
    R = Pose.T @ kf.Pose
    t = Pose.T @ (kf.Pos - Pos)
    return R, t


def correct_and_augment(kf: KFCarry, klm: KeylineMap, Pose: Array,
                        Pos: Array, zfm: float, *, dist_thresh: float,
                        chain_steps: int, aug_iters: int,
                        min_baseline_px: float = 2.0):
    """The full per-frame maintenance block (rebvo_second_t.cpp:429-444):
    forward chains through the inverted back matches, epipolar
    correct + augment + prune in both directions. Returns the updated
    (kf map m_id_f, frame map m_id_kf, fow_m, back_m).

    Degenerate-baseline guard (beyond the reference, whose pipeline
    never runs this block in production): when the keyframe-to-frame
    translation is so small that the expected disparity
    zfm * |t| * mean(rho) is under `min_baseline_px`, the essential
    matrix is numerically meaningless — the epipolar distance would
    prune nearly every true match, collapsing the chains and forcing a
    keyframe save every frame. In that regime the raw match chains are
    kept untouched."""
    nv = jnp.maximum(jnp.sum(klm.valid), 1)
    rho_mean = jnp.sum(jnp.where(klm.valid, klm.rho, 0.0)) / nv

    # --- backward direction: frame keylines -> KF map -------------------
    # E_back from R = kf.Pose^T Pose, t = Pose^T (kf.Pos - Pos)
    # (correctAugmentate, kfvo.cpp:893-897).
    R_b = kf.Pose.T @ Pose
    t_b = Pose.T @ (kf.Pos - Pos)
    E_b = essential_matrix(R_b, t_b)
    strong_b = zfm * jnp.linalg.norm(t_b) * rho_mean > min_baseline_px
    m_raw = jnp.where(klm.valid, klm.m_id_kf, -1)
    m_kf = klm.m_id_kf
    m_kf, _ = chain_correct(klm.px, klm.py, m_kf, kf.klm, E_b, zfm,
                            chain_steps)
    m_kf = augment_matches(m_kf, klm.p_id, klm.n_id, aug_iters)
    m_kf, d_b = chain_correct(klm.px, klm.py, m_kf, kf.klm, E_b, zfm,
                              chain_steps)
    m_kf = jnp.where((d_b > dist_thresh) | (~klm.valid), -1, m_kf)
    m_kf = jnp.where(strong_b, m_kf, m_raw)
    back_m = jnp.sum(m_kf >= 0).astype(jnp.int32)

    # --- forward direction: KF keylines -> frame map --------------------
    # (forwardCorrectAugmentate, kfvo.cpp:969-1041). The KF's stored
    # forward matches point at the PREVIOUS frame's map; rebuild them for
    # this frame by composing with the inverted new->old back matches,
    # the reference's per-frame buildForwardMatch (kfvo.cpp:739-771,
    # called each frame at rebvo_second_t.cpp:432).
    R_f = Pose.T @ kf.Pose
    t_f = kf.Pose.T @ (Pos - kf.Pos)
    E_f = essential_matrix(R_f, t_f)
    strong_f = zfm * jnp.linalg.norm(t_f) * rho_mean > min_baseline_px
    inv_old_to_new = invert_matches(klm.m_id, klm.valid, klm.K)
    m_f = build_forward_match(kf.klm.m_id_f, kf.klm.valid, inv_old_to_new)
    m_f_raw = m_f
    m_f, _ = chain_correct(kf.klm.px, kf.klm.py, m_f, klm, E_f, zfm,
                           chain_steps)
    m_f = augment_matches(m_f, kf.klm.p_id, kf.klm.n_id, aug_iters)
    m_f, d_f = chain_correct(kf.klm.px, kf.klm.py, m_f, klm, E_f, zfm,
                             chain_steps)
    m_f = jnp.where((d_f > dist_thresh) | (~kf.klm.valid), -1, m_f)
    m_f = jnp.where(strong_f, m_f, m_f_raw)
    fow_m = jnp.sum(m_f >= 0).astype(jnp.int32)

    return m_f, m_kf, fow_m, back_m


def track_keyframe(
    kf: KFCarry, klm: KeylineMap, fv, Pose: Array, Pos: Array,
    K_scale: Array, kl_num: Array, s_rho_q: Array, enabled: Array,
    G_gauge: Array, *,
    cam, params,
) -> KFTrackResult:
    """One frame of online keyframe tracking (the whole TrackKeyFrames
    block). `klm` is the frame's final map (post depth filtering), `fv`
    the frame's FieldView, `Pose`/`Pos` the dead-reckoned global pose.
    `enabled` gates the whole block on the frame's estimation health —
    the reference only runs it inside the match-success branch
    (rebvo_second_t.cpp:423-444)."""
    p = params
    dt = Pose.dtype
    zfm = cam.zfm

    have_kf = kf.count > 0
    run = have_kf & enabled

    # --- chain maintenance (only meaningful with a live keyframe) -------
    m_f, m_kf, fow_m, back_m = correct_and_augment(
        kf, klm, Pose, Pos, zfm, dist_thresh=p.KFDistThresh,
        chain_steps=p.KFChainSteps, aug_iters=p.KFAugIters,
        min_baseline_px=p.KFMinBaselinePx)
    m_f = jnp.where(run, m_f, jnp.where(have_kf, kf.klm.m_id_f, -1))
    m_kf = jnp.where(run, m_kf, jnp.where(have_kf, klm.m_id_kf, -1))
    fow_m = jnp.where(run, fow_m, 0)
    back_m = jnp.where(run, back_m, 0)

    # --- keyframe-relative pose re-anchor (beyond the reference; OPT-IN
    # via KFReAnchor — see config.py: a mono re-anchor from stale KF
    # depths measurably adds drift, and the reference's own online block
    # never feeds the pose either) ---------------------------------------
    if not p.KFReAnchor:
        return _finish(kf, klm, m_f, m_kf, Pose, Pos, fow_m, back_m,
                       kl_num, enabled, run, have_kf,
                       jnp.asarray(False), G_gauge, params=p)
    from rebvo_tpu.backend.kfvo import align_to_keyframe
    R_prior, t_prior = kf_relative_pose(kf, Pose, Pos)
    # Alignment runs in the KEYFRAME's map gauge. Exported translations
    # are in the bootstrap gauge (x K_scale metric in VI); map units at
    # capture are bootstrap / G_capture (rho inflated by G => distances
    # shrunken by G). cf converts exported -> KF-map units:
    # t_map = t_exported / (K_scale * G_capture).
    Ks = jnp.maximum(K_scale, 1e-12)
    cf = 1.0 / (Ks * jnp.maximum(kf.G, 1e-12))
    ares = align_to_keyframe(
        kf.klm, fv, R_prior, t_prior * cf,
        zfm=zfm, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height,
        max_s_rho=s_rho_q, match_thresh=p.TrackerMatchThresh,
        k_huber=p.ReweigthDistance, iter_max=p.TrackerIterNum,
        init_iter=p.TrackerInitIterNum)
    # --- innovation chi^2 acceptance ---------------------------------
    # Under H0 (dead reckoning and alignment both healthy) the
    # correction dX = [dV; dW] is distributed with covariance
    # S = age * Q_drift + Cov(align): a per-frame random-walk drift
    # budget plus the alignment's own JtJ^-1. Accept iff the Mahalanobis
    # norm passes the 6-dof 99.9% quantile AND the alignment is
    # well-conditioned (covariance trace caps) — a near-singular JtJ
    # (stale KF out of view, textureless frame) fails the caps; a
    # confidently-wrong large correction (wrong-scale prior) fails the
    # chi^2 against the drift budget.
    dW = ares.W0
    dV = ares.Vel
    finite = jnp.all(jnp.isfinite(dW)) & jnp.all(jnp.isfinite(dV)) & \
        jnp.all(jnp.isfinite(ares.RVel)) & jnp.all(jnp.isfinite(ares.RW0))
    age_f = jnp.maximum(kf.age, 1).astype(dt)
    # drift stds are stated in exported-gauge units; dV lives in the KF
    # map gauge, so the translation budget converts through cf
    q = jnp.concatenate([
        jnp.full((3,), (p.KFDriftTransStd * cf) ** 2, dt),
        jnp.full((3,), p.KFDriftRotStd ** 2, dt)]) * age_f
    C = jnp.zeros((6, 6), dt)
    C = C.at[:3, :3].set(ares.RVel).at[3:, 3:].set(ares.RW0)
    S = C + jnp.diag(q)
    dX = jnp.concatenate([dV, dW])
    chi2 = dX @ jnp.linalg.solve(S, dX)
    CHI2_6_999 = 22.458                       # chi^2 6-dof 0.999 quantile
    conditioned = (jnp.trace(ares.RW0) < p.KFAlignRotUncertMax ** 2) & \
        (jnp.trace(ares.RVel) < (p.KFAlignTransUncertMax * cf) ** 2)
    align_ok = run & finite & conditioned & (chi2 < CHI2_6_999) & \
        (back_m >= p.GlobalMatchThreshold)
    # Kalman-blend the correction instead of wholesale replacement: the
    # dead-reckoned pose is a prior with covariance Q = diag(q); the
    # alignment a measurement with covariance C. Applied correction
    # = Q (Q + C)^-1 dX — full anchor only when the alignment is much
    # more certain than the accumulated drift, a proportionate nudge
    # otherwise (the all-or-nothing anchor injected the alignment's own
    # noise at every accept).
    from rebvo_tpu.core.geometry import so3_exp
    gain = jnp.diag(q) @ jnp.linalg.inv(S)
    dX_app = gain @ dX
    dV_app, dW_app = dX_app[:3], dX_app[3:]
    dR_b = so3_exp(dW_app)
    R_b = dR_b @ R_prior
    t_b = dR_b @ (t_prior * cf) + dV_app
    Pose_kf = kf.Pose @ R_b.T
    Pos_kf = kf.Pos - Pose_kf @ (t_b / cf)
    Pose = jnp.where(align_ok, Pose_kf, Pose)
    Pos = jnp.where(align_ok, Pos_kf, Pos)

    return _finish(kf, klm, m_f, m_kf, Pose, Pos, fow_m, back_m, kl_num,
                   enabled, run, have_kf, align_ok, G_gauge, params=p)


def _finish(kf: KFCarry, klm: KeylineMap, m_f: Array, m_kf: Array,
            Pose: Array, Pos: Array, fow_m: Array, back_m: Array,
            kl_num: Array, enabled: Array, run: Array, have_kf: Array,
            align_ok: Array, G_gauge: Array, *, params) -> KFTrackResult:
    """Keyframe switch + carry update (rebvo_second_t.cpp:591-596),
    shared by the re-anchor and no-re-anchor paths."""
    p = params
    dt = Pose.dtype
    limit = (jnp.minimum(jnp.asarray(p.TrackPoints, jnp.int32),
                         kl_num).astype(dt) * p.KFSavePercent)
    # the initial keyframe is also gated on estimation health — the
    # reference pushes only inside the match-success branch
    # (rebvo_second_t.cpp:423-444), so a failed frame never anchors.
    save = (enabled & ~have_kf) | (run & (back_m.astype(dt) < limit))

    ar = jnp.arange(klm.K, dtype=jnp.int32)
    neg = jnp.full((klm.K,), -1, jnp.int32)
    # resetForwardMatch (kfvo.cpp:774-781): identity matches, rho0 backup
    new_kf_klm = klm._replace(
        m_id_f=jnp.where(klm.valid, ar, neg),
        m_id_kf=jnp.where(klm.valid, ar, neg),
        rho0=klm.rho, s_rho0=klm.s_rho)
    kf_klm = jax.tree_util.tree_map(
        lambda a, b: jnp.where(save, a, b), new_kf_klm,
        kf.klm._replace(m_id_f=m_f))
    kf_out = KFCarry(
        klm=kf_klm,
        Pose=jnp.where(save, Pose, kf.Pose),
        Pos=jnp.where(save, Pos, kf.Pos),
        count=kf.count + save.astype(jnp.int32),
        age=jnp.where(save, 0, kf.age + 1).astype(jnp.int32),
        G=jnp.where(save, G_gauge, kf.G))

    # resetKFMatch (kfvo.cpp:783-787) on the frame map when saved
    klm_out = klm._replace(
        m_id_kf=jnp.where(save, jnp.where(klm.valid, ar, neg), m_kf))

    return KFTrackResult(kf=kf_out, klm=klm_out, Pose=Pose, Pos=Pos,
                         fow_m=fow_m, back_m=back_m, saved=save,
                         align_ok=align_ok)
