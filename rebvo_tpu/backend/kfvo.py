"""Keyframe-relative VO toolkit.

Re-implements the core of kfvo (reference src/mtracklib/kfvo.cpp — the
'on development' keyframe-relative backend, rebvo.h:436): depth
transfer between keyframe and frame coordinates, keyframe-to-frame
alignment, and keyframe map refinement — built from the framework's
existing batched kernels instead of the reference's per-keyline loops.
The match-chain 'augmentate' heuristics (kfvo.cpp:790-1041) are
superseded by the Schur BA in backend/ba.py, which optimises the same
constraints globally.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.core.geometry import rotate_gradients
from rebvo_tpu.frontend.state import RHO_MAX, RHO_MIN, KeylineMap
from rebvo_tpu.kernels.depth_filter import depth_ekf
from rebvo_tpu.kernels.pose_solver import FieldView, minimizer_rv

Array = jax.Array


def relative_pose(Pose_a: Array, Pos_a: Array, Pose_b: Array, Pos_b: Array):
    """(R, t) mapping frame-a camera points into frame b:
    X_b = R X_a + t, from the global camera-to-world poses."""
    R = Pose_b.T @ Pose_a
    t = Pose_b.T @ (Pos_a - Pos_b)
    return R, t


def transform_map(klm: KeylineMap, R: Array, t: Array, zfm: Array,
                  scale: Array = None) -> KeylineMap:
    """SE(3) transform of an edge map's geometry: positions, depths and
    gradients move to the target frame (translateDepth_* semantics,
    kfvo.cpp:607-686, generalised to full SE(3)).

    `scale` optionally rescales the source map's depth gauge first
    (keyframe K vs frame K)."""
    rho = klm.rho
    s_rho = klm.s_rho
    if scale is not None:
        rho = rho / scale
        s_rho = s_rho / scale
    rho_c = jnp.clip(rho, RHO_MIN, RHO_MAX)
    z = 1.0 / rho_c
    X = klm.px * z / zfm
    Y = klm.py * z / zfm
    Px = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * z + t[0]
    Py = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * z + t[1]
    Pz = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * z + t[2]
    ok = jnp.abs(Pz) > 1e-6
    Pz_s = jnp.where(ok, Pz, 1.0)
    px2 = jnp.where(ok, Px * zfm / Pz_s, klm.px)
    py2 = jnp.where(ok, Py * zfm / Pz_s, klm.py)
    rho2 = jnp.where(ok, 1.0 / Pz_s, rho)
    # first-order uncertainty transport: s' ~ s * (rho'/rho)
    s2 = jnp.where(ok, s_rho * jnp.abs(rho2 / rho_c), s_rho)
    gx2, gy2 = rotate_gradients(R, klm.gx, klm.gy)
    return klm._replace(px=px2, py=py2, rho=rho2, s_rho=s2, gx=gx2, gy=gy2)


class KFAlignResult(NamedTuple):
    R: Array      # refined rotation (kf -> frame)
    t: Array      # refined translation
    Vel: Array    # minimiser increment (for diagnostics)
    W0: Array
    m_id_f: Array
    score: Array
    RVel: Array   # [3,3] covariance of the translation increment
    RW0: Array    # [3,3] covariance of the rotation increment
                  # (JtJ^-1 slices, the reference's covariance return,
                  # global_tracker.cpp:796-805) — feed the innovation
                  # chi^2 acceptance gate in frontend/kf_tracking.py


def align_to_keyframe(
    kf_klm: KeylineMap, frame_fv: FieldView,
    R_prior: Array, t_prior: Array,
    *, zfm: Array, cx: Array, cy: Array, width: int, height: int,
    max_s_rho: Array, match_thresh: float = 0.5, k_huber: float = 2.0,
    iter_max: int = 5, init_iter: int = 2,
) -> KFAlignResult:
    """Refine the keyframe->frame pose by edge alignment against the
    current frame's match field (Minimizer_RV_KF role, kfvo.cpp:1677).

    The keyframe map is pre-transformed by the prior; the minimiser then
    estimates the residual rototranslation, which is composed back."""
    dt = kf_klm.px.dtype
    pre = transform_map(kf_klm, R_prior, t_prior, zfm)
    res = minimizer_rv(
        jnp.zeros((3,), dt), jnp.zeros((3,), dt), pre, frame_fv,
        zfm=zfm, cx=cx, cy=cy, width=width, height=height,
        max_r=jnp.asarray(20.0, dt), match_thresh=match_thresh,
        max_s_rho=max_s_rho, match_num_min=jnp.zeros((), jnp.int32),
        k_huber=k_huber, iter_max=iter_max, init_iter=init_iter,
        init_type=2)
    from rebvo_tpu.core.geometry import so3_exp
    dR = so3_exp(res.W0)
    R_new = dR @ R_prior
    t_new = dR @ t_prior + res.Vel
    return KFAlignResult(R=R_new, t=t_new, Vel=res.Vel, W0=res.W0,
                         m_id_f=res.m_id_f, score=res.score,
                         RVel=res.RVel, RW0=res.RW0)


def refine_keyframe_depths(
    kf_klm: KeylineMap, R: Array, t: Array, vel_equiv: Array,
    zfm: Array, *, reshape_q_abs: float = 1e-4,
    loc_uncertainty: float = 1.0,
) -> KeylineMap:
    """EKF-refine the keyframe's inverse depths from current-frame
    matches (mapKFUsingIDK role, kfvo.cpp:1147-1360): transform to the
    frame, run the batched scalar EKF, transform back.

    The caller must first set the matched measurement fields (p_m via
    klm.px/py updated to the observed frame positions; p0 = predicted)
    exactly as the front-end's matching stage does."""
    fwd = transform_map(kf_klm, R, t, zfm)
    upd = depth_ekf(fwd, vel_equiv, zfm, reshape_q_abs=reshape_q_abs,
                    loc_uncertainty=loc_uncertainty)
    back = transform_map(upd, R.T, -(R.T @ t), zfm)
    # keep original positions/gradients; only depth stats return
    return kf_klm._replace(rho=back.rho, s_rho=back.s_rho,
                           rho0=back.rho0, s_rho0=back.s_rho0)


def _proj_inv_depth(px: Array, py: Array, rho: Array, R: Array, t: Array,
                    zfm: Array, pre_scale: Array = 1.0) -> Array:
    """Inverse depth of each keyline after SE(3) transport into the
    partner frame — the q1[2] of the reference's unProject/project pair
    (kfvo.h:42-81). Non-positive values mark behind-camera points."""
    rho_c = jnp.clip(rho, RHO_MIN, RHO_MAX)
    z = pre_scale / rho_c
    X = px * z / zfm
    Y = py * z / zfm
    Pz = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * z + t[2]
    return jnp.where(Pz > 1e-9, 1.0 / jnp.maximum(Pz, 1e-9), -1.0)


def optimize_scale(klm: KeylineMap, kf_klm: KeylineMap, m_id: Array,
                   R: Array, t: Array, zfm: Array, *,
                   mode: str = "fwd", pre_scale: Array = 1.0,
                   init: Array = 1.0) -> Tuple[Array, Array]:
    """Information-weighted depth-gauge ratio between a frame map and a
    keyframe map — the reference's optimizeScale / optimizeScaleF2KF /
    optimizeScaleBack (kfvo.cpp:222-330), batched.

    Frame keylines are transported into the keyframe camera by (R, t)
    and their corrected inverse depths q1z compared with the matched
    keyframe depths rho_b under per-pair information weights:

      mode="fwd"  (optimizeScale, matches = m_id into kf_klm):
          v = s^2 + s_b^2;  Kr = sum(q1z^2/v) / sum(q1z*rho_b/v)
      mode="f2kf" (optimizeScaleF2KF):
          v = s^2 (q1z/rho)^2 + s_b^2;
          Kr = sum(rho_b^2/v) / sum(q1z^2/v), weight W_Kp = sum(q1z^2/v)
      mode="back" (optimizeScaleBack, roles swapped by the caller, with
          `pre_scale` = the frame gauge K and `init` = the KF's K):
          v = (s*q1z/rho*init)^2 + s_b^2;
          Kr = sum(q1z*rho_b/v) / sum(q1z^2/v)

    Returns (Kr, weight) — weight is the denominator sum (for "f2kf"
    exactly the reference's W_Kp output); 0 means no usable pairs and
    Kr falls back to 1 / `init` exactly like the reference's guards."""
    ok = klm.valid & (m_id >= 0)
    ms = jnp.maximum(m_id, 0)
    rho_b = kf_klm.rho[ms]
    s_b = kf_klm.s_rho[ms]
    q1z = _proj_inv_depth(klm.px, klm.py, klm.rho, R, t, zfm,
                          pre_scale=pre_scale)
    ok = ok & (q1z > 0)
    if mode == "fwd":
        v = klm.s_rho ** 2 + s_b ** 2
        num = q1z * q1z / v
        den = q1z * rho_b / v
        fallback = jnp.asarray(1.0, q1z.dtype)
    elif mode == "f2kf":
        v = (klm.s_rho * q1z / jnp.clip(klm.rho, RHO_MIN, RHO_MAX)) ** 2 \
            + s_b ** 2
        den = q1z * q1z / v
        num = rho_b * rho_b / v
        fallback = jnp.asarray(1.0, q1z.dtype)
    elif mode == "back":
        v = (klm.s_rho * q1z / jnp.clip(klm.rho, RHO_MIN, RHO_MAX)
             * init) ** 2 + s_b ** 2
        num = q1z * rho_b / v
        den = q1z * q1z / v
        fallback = jnp.asarray(init, q1z.dtype)
    else:
        raise ValueError(mode)
    num_s = jnp.sum(jnp.where(ok, num, 0.0))
    den_s = jnp.sum(jnp.where(ok, den, 0.0))
    good = (num_s > 0) & (den_s > 0)
    Kr = jnp.where(good, num_s / jnp.where(good, den_s, 1.0), fallback)
    return Kr, den_s


def mutual_exclusion(m_fwd: Array, valid: Array, m_back: Array,
                     px: Array, py: Array, ux: Array, uy: Array, *,
                     dist_thresh: float, discard_non_mutual: bool = True,
                     along_normal: bool = False) -> Tuple[Array, Array, Array]:
    """Round-trip match consistency filter (mutualExclusionSimple,
    kfvo.cpp:423-525): for each keyline with a forward match, follow the
    partner's back match; if the round trip lands farther than
    `dist_thresh` from the origin keyline (euclidean, or projected on
    the keyline normal with `along_normal`, the reference's second
    branch), or there is no back match and `discard_non_mutual`, the
    forward match is cleared.

    Returns (filtered m_fwd, total_checked, mutual_survivors)."""
    has = valid & (m_fwd >= 0)
    ms = jnp.maximum(m_fwd, 0)
    mb = m_back[ms]                       # partner's back match
    mb_ok = mb >= 0
    mbs = jnp.maximum(mb, 0)
    dx = px - px[mbs]
    dy = py - py[mbs]
    if along_normal:
        d = jnp.abs(dx * ux + dy * uy)
    else:
        d = jnp.sqrt(dx * dx + dy * dy)
    far = mb_ok & (d > dist_thresh)
    drop = has & (far | ((~mb_ok) & discard_non_mutual))
    keep = has & mb_ok & ~far
    out = jnp.where(drop, -1, m_fwd)
    return out, jnp.sum(has).astype(jnp.int32), \
        jnp.sum(keep).astype(jnp.int32)


def count_kf_matches(klm: KeylineMap) -> Array:
    """countMatches role (kfvo.cpp:18-55)."""
    return jnp.sum(klm.valid & (klm.m_id_kf >= 0)).astype(jnp.int32)


def keylines_in_fov(klm: KeylineMap, R: Array, t: Array, zfm: Array,
                    cx: Array, cy: Array, width: int, height: int) -> Array:
    """kls_on_fov role (kfvo.cpp:688-712): how many keylines project
    inside the target frame."""
    m = transform_map(klm, R, t, zfm)
    x = m.px + cx
    y = m.py + cy
    inside = klm.valid & (x >= 0) & (x < width) & (y >= 0) & (y < height) & \
        (m.rho > 0)
    return jnp.sum(inside).astype(jnp.int32)
