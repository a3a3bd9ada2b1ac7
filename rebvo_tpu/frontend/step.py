"""The per-frame VO step: one jitted, vmap-able function.

Re-implements the reference's SecondThread processing order (reference
src/rebvo/rebvo_second_t.cpp:128-623, vision-only path) plus FirstThr's
detection stage (rebvo_first_t.cpp:259-272) as a single pure function

    step(state, frame, t) -> (state', FrameOutput)

over fixed-shape arrays. The reference's 3-thread pipeline exists to
hide I/O latency on a 3-core ARM; on TPU the whole computation fuses
into one XLA program and pipelining happens through async dispatch of
consecutive steps, while the host feeds frames ahead (io.pipeline).

Everything the reference hides in C++ statics or thread-locals is
explicit state here, so the function vmaps over a batch of sequences
(multi-sequence data parallelism, SURVEY.md §2.9) and shards over a
device mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.core.geometry import (CameraModel, rotate_gradients,
                                     rotate_hom_points, so3_exp, so3_log)
from rebvo_tpu.frontend.state import (BIG, RHO_INIT, RHO_MAX, KeylineMap,
                                      NavData)
from rebvo_tpu.kernels.depth_filter import (depth_ekf, estimate_quantile,
                                            estimate_rescaling_opt,
                                            regularize_1_iter)
from rebvo_tpu.kernels.edge_detect import (detect_keylines,
                                           re_estimate_thresh,
                                           update_detector_threshold)
from rebvo_tpu.kernels.field import build_field
from rebvo_tpu.kernels.matching import directed_matching, forward_match
from rebvo_tpu.kernels.pose_solver import FieldView, minimizer_rv
from rebvo_tpu.kernels.scale_space import build_scale_space

Array = jax.Array

# Intensity scale of the float images (the reference's RGB-sum
# convention: max_img_value = 255*3, rebvo.cpp:300).
MAX_IMG_VALUE = 765.0


class VOState(NamedTuple):
    """Carry state between frames (one sequence)."""

    klm: KeylineMap        # previous frame's edge map (post-processing)
    mask_img: Array        # [H, W] previous map's detection id mask
    thresh: Array          # detector auto-threshold
    last_kl_num: Array     # keylines detected last frame
    Vel: Array             # [3] warm-start translation
    W0: Array              # [3] warm-start rotation
    Kp: Array              # per-frame rescaling ratio
    P_Kp: Array
    K_scale: Array         # global metric scale (1 for vision-only)
    Pose: Array            # [3,3] global rotation
    Pos: Array             # [3] global position
    t: Array               # previous frame timestamp
    frame_count: Array     # int32 frames processed


class FrameOutput(NamedTuple):
    nav: NavData
    s_rho_q: Array
    score: Array
    rel_error: Array


def init_state(params: REBVOParameters, dtype=jnp.float32) -> VOState:
    K = params.KeylineMax
    H, W = params.ImageHeight, params.ImageWidth
    return VOState(
        klm=KeylineMap.empty(K, dtype=dtype),
        mask_img=jnp.full((H, W), -1, jnp.int32),
        thresh=jnp.asarray(params.DetectorThresh, dtype),
        last_kl_num=jnp.zeros((), jnp.int32),
        Vel=jnp.zeros((3,), dtype),
        W0=jnp.zeros((3,), dtype),
        Kp=jnp.ones((), dtype),
        P_Kp=jnp.asarray(5e-6, dtype),
        K_scale=jnp.ones((), dtype),
        Pose=jnp.eye(3, dtype=dtype),
        Pos=jnp.zeros((3,), dtype),
        t=jnp.zeros((), dtype),
        frame_count=jnp.zeros((), jnp.int32),
    )


class VOFrontend:
    """Binds the static configuration and exposes pure step functions.

    Usage:
        fe = VOFrontend(params)
        state = fe.init()
        state = fe.bootstrap(state, frame0, t0)      # detection only
        state, out = fe.step(state, frame, t)        # per frame

    `fe.step` is jitted; `fe.step_fn` is the unjitted pure function for
    vmap/pjit composition.
    """

    def __init__(self, params: REBVOParameters, cam: CameraModel = None):
        self.params = params
        self.cam = cam if cam is not None else CameraModel.from_params(params)
        self.step = jax.jit(self.step_fn)
        self.bootstrap = jax.jit(self.bootstrap_fn)

    def init(self) -> VOState:
        return init_state(self.params)

    # ------------------------------------------------------------------

    def _detect(self, state: VOState, frame: Array):
        p = self.params
        ss = build_scale_space(frame, p.Sigma0, p.KSigma, 3)
        thresh = update_detector_threshold(
            state.thresh, state.last_kl_num, p.ReferencePoints,
            p.DetectorAutoGain, p.DetectorMaxThresh, p.DetectorMinThresh)
        klm, mask_img, kl_num = detect_keylines(
            ss, thresh, K=p.KeylineMax, kl_max=p.MaxPoints,
            win_s=p.DetectorPlaneFitSize, per_hist=p.DetectorPosNegThresh,
            dog_thresh=p.DetectorDoGThresh, max_img_value=MAX_IMG_VALUE,
            cx=self.cam.cx, cy=self.cam.cy)
        retuned = re_estimate_thresh(klm, p.TrackPoints, p.QCutOffNumBins)
        return klm, mask_img, kl_num, thresh, retuned

    def bootstrap_fn(self, state: VOState, frame: Array, t: Array) -> VOState:
        """Process the first frame: detection only (the reference's dummy
        first-frame consume, rebvo_second_t.cpp:108-122)."""
        klm, mask_img, kl_num, thresh, _ = self._detect(state, frame)
        return state._replace(
            klm=klm, mask_img=mask_img, thresh=thresh, last_kl_num=kl_num,
            t=jnp.asarray(t, state.t.dtype),
            frame_count=state.frame_count + 1)

    # ------------------------------------------------------------------

    def step_fn(self, state: VOState, frame: Array,
                t: Array) -> Tuple[VOState, FrameOutput]:
        p = self.params
        cam = self.cam
        dt_f = state.Vel.dtype
        t = jnp.asarray(t, dt_f)

        dt_frame = t - state.t
        dt_frame = jnp.where(dt_frame < 0.001, 1.0 / p.config_fps, dt_frame)

        # --- Stage 1 (FirstThr): detection on the new frame.
        new_klm, new_mask, kl_num, thresh, retuned = self._detect(state, frame)

        # --- Stage 2 (SecondThread), vision-only path.
        old = state.klm

        s_rho_q = estimate_quantile(
            old, percentile=p.QCutOffQuantile, nbins=p.QCutOffNumBins)

        field_img = build_field(new_klm, retuned, radius=min(p.FieldRadius, p.SearchRange),
                                height=cam.height, width=cam.width)
        fv = FieldView.from_map(field_img, new_klm)

        match_num_min = jnp.minimum(
            jnp.asarray(p.MatchNumThresh, jnp.int32),
            state.frame_count.astype(jnp.int32))

        mres = minimizer_rv(
            state.Vel, state.W0, old, fv,
            zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height,
            max_r=jnp.asarray(float(p.SearchRange), dt_f),
            match_thresh=p.TrackerMatchThresh, max_s_rho=s_rho_q,
            match_num_min=match_num_min, k_huber=p.ReweigthDistance,
            iter_max=p.TrackerIterNum, init_iter=p.TrackerInitIterNum,
            init_type=p.TrackerInitType)

        nan_fail = jnp.any(~jnp.isfinite(mres.Vel)) | jnp.any(~jnp.isfinite(mres.W0))
        V = jnp.where(nan_fail, 0.0, mres.Vel)
        W = jnp.where(nan_fail, 0.0, mres.W0)
        P_V = jnp.where(nan_fail, jnp.eye(3, dtype=dt_f) * BIG, mres.RVel)
        P_W = jnp.where(nan_fail, jnp.eye(3, dtype=dt_f) * BIG, mres.RW0)

        # Forward depth transfer along the minimiser's matches.
        new_fm, _ = forward_match(old, new_klm, mres.m_id_f)

        # Rotations: R0 forward, R backward (rebvo_second_t.cpp:360-363).
        R0 = so3_exp(W)
        R = R0.T

        # Forward-rotate the old map (positions, depth, gradients).
        px, py, rho, s_rho = rotate_hom_points(
            R0, old.px, old.py, old.rho, old.s_rho, cam.zfm)
        gx, gy = rotate_gradients(R0, old.gx, old.gy)
        old_rot = old._replace(px=px, py=py, rho=rho, s_rho=s_rho,
                               gx=gx, gy=gy)

        # Directed epipolar re-matching on the old map's mask.
        dres = directed_matching(
            new_fm, old_rot, state.mask_img, V, P_V, R,
            zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height,
            max_steps=p.MatchMaxSteps,
            min_thr_mod=p.MatchThreshModule,
            min_thr_ang=p.MatchThreshAngle,
            max_radius=float(p.SearchRange),
            loc_uncertainty=p.LocationUncertaintyMatch)
        klm_num = dres.nmatch

        match_fail = klm_num < p.GlobalMatchThreshold
        est_ok = (~nan_fail) & (~match_fail)

        # --- Depth processing (skipped on failure, like the reference's
        # restart branch — computed unconditionally, selected at the end).
        proc, _ = regularize_1_iter(dres.new, p.RegularizeThresh)
        proc = depth_ekf(proc, V, cam.zfm,
                         reshape_q_abs=p.ReshapeQAbsolute,
                         loc_uncertainty=p.LocationUncertainty)
        proc, Kp_new, P_Kp_new = estimate_rescaling_opt(
            proc, apply=bool(p.DoReScaling))

        ok_f = est_ok
        new_final = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok_f, a, b), proc, dres.new)
        Kp = jnp.where(est_ok, Kp_new, 1.0)
        P_Kp = jnp.where(nan_fail, BIG, jnp.where(match_fail, 10.0, P_Kp_new))

        # Restart resets the warm start (rebvo_second_t.cpp:389-421).
        V_out = jnp.where(est_ok, V, 0.0)

        # --- Pose integration (rebvo_second_t.cpp:550-552).
        K_scale = state.K_scale
        Pose = state.Pose @ R
        Pos = state.Pos - Pose @ (V_out * K_scale)

        nav = NavData(
            t=t, dt=dt_frame,
            Rot=R, RotLie=so3_log(R),
            Vel=-V_out * K_scale / dt_frame,
            Pose=Pose, PoseLie=so3_log(Pose), Pos=Pos,
            g=jnp.zeros((3,), dt_f),
            scale=K_scale,
            estimation_ok=est_ok,
            kl_num=kl_num, klm_num=klm_num)

        new_state = VOState(
            klm=new_final, mask_img=new_mask, thresh=thresh,
            last_kl_num=kl_num, Vel=V_out, W0=W, Kp=Kp, P_Kp=P_Kp,
            K_scale=K_scale, Pose=Pose, Pos=Pos, t=t,
            frame_count=state.frame_count + 1)

        out = FrameOutput(nav=nav, s_rho_q=s_rho_q, score=mres.score,
                          rel_error=mres.rel_error)
        return new_state, out
