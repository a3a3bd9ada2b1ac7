"""The per-frame VO step: one jitted, vmap-able function.

Re-implements the reference's SecondThread processing order (reference
src/rebvo/rebvo_second_t.cpp:128-623 — both the vision-only and the
visual-inertial path) plus FirstThr's detection stage
(rebvo_first_t.cpp:259-272) as pure functions

    step(state, frame, t)               -> (state', FrameOutput)
    step_imu(state, frame, t, imu_win)  -> (state', FrameOutput)

over fixed-shape arrays. The reference's 3-thread pipeline exists to
hide I/O latency on a 3-core ARM; on TPU the whole computation fuses
into one XLA program and pipelining happens through async dispatch of
consecutive steps, while the host feeds frames ahead.

Everything the reference hides in C++ statics or thread-locals is
explicit state here, so the functions vmap over a batch of sequences
(multi-sequence data parallelism, SURVEY.md §2.9) and shard over a
device mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.core.geometry import (CameraModel, rotate_gradients,
                                     rotate_hom_points, so3_exp, so3_log)
from rebvo_tpu.frontend.imu import (ImuWindow, IntegratedImu, ScaleWindows,
                                    bias_correct, est_acel_lsq4,
                                    est_ka_gmek_bias, ext_rot_vel,
                                    integrate_window, mean_acel4,
                                    rotation_between)
from rebvo_tpu.frontend.kf_tracking import KFCarry, track_keyframe
from rebvo_tpu.frontend.state import (BIG, RHO_INIT, RHO_MAX, RHO_MIN,
                                      KeylineMap, NavData)
from rebvo_tpu.kernels.depth_filter import (depth_ekf, estimate_quantile,
                                            estimate_rescaling_opt,
                                            regularize_1_iter)
from rebvo_tpu.kernels.edge_detect import (detect_keylines,
                                           re_estimate_thresh,
                                           update_detector_threshold)
from rebvo_tpu.kernels.field import build_field
from rebvo_tpu.kernels.matching import (directed_matching,
                                        directed_matching_field,
                                        forward_match)
from rebvo_tpu.kernels.pose_solver import (FieldView, minimizer_rv,
                                           minimizer_v)
from rebvo_tpu.kernels.scale_space import build_scale_space

Array = jax.Array

# Intensity scale of the float images (the reference's RGB-sum
# convention: max_img_value = 255*3, rebvo.cpp:300).
MAX_IMG_VALUE = 765.0


from rebvo_tpu.core.stats import masked_median as _masked_median


class ImuCarry(NamedTuple):
    """Visual-inertial filter state (the reference's IMUState,
    rebvo.h:239-290, plus the ScaleEstimator statics)."""

    init: Array         # bool — gyro-bias init complete
    n_init: Array       # int32 — frames accumulated for bias init
    giro_init: Array    # [3] accumulated gyro*dt
    g_init: Array       # [3] accumulated -cacel
    Bg: Array           # [3] gyro bias
    W_Bg: Array         # [3,3] bias information
    Vg: Array           # [3] translation-only warm start
    X7: Array           # [7] scale/gravity/bias filter state
    P7: Array           # [7,7]
    u_est: Array        # [3] heading seed for gravity-aligned pose
    g_est: Array        # [3]
    b_est: Array        # [3]
    windows: ScaleWindows
    Posgv: Array        # [3] unfiltered-integration diagnostic

    @staticmethod
    def make(params: REBVOParameters, dtype=jnp.float32) -> "ImuCarry":
        p = params
        P7 = jnp.diag(jnp.asarray([
            p.ScaleStdDevInit ** 2, 100.0, 100.0, 100.0,
            p.VBiasStdDev ** 2 * 10, p.VBiasStdDev ** 2 * 10,
            p.VBiasStdDev ** 2 * 10], dtype))
        X7 = jnp.asarray([jnp.pi / 4, 0.0, p.g_module, 0.0, 0.0, 0.0, 0.0],
                         dtype)
        dtf = 1.0 / p.config_fps
        W_Bg = jnp.eye(3, dtype=dtype) / (
            p.GiroBiasStdDev ** 2 * dtf * dtf * 100.0)
        return ImuCarry(
            init=jnp.asarray(False),
            n_init=jnp.zeros((), jnp.int32),
            giro_init=jnp.zeros((3,), dtype),
            g_init=jnp.zeros((3,), dtype),
            Bg=jnp.zeros((3,), dtype),
            W_Bg=W_Bg,
            Vg=jnp.zeros((3,), dtype),
            X7=X7, P7=P7,
            u_est=jnp.asarray([1.0, 0.0, 0.0], dtype),
            g_est=jnp.zeros((3,), dtype),
            b_est=jnp.zeros((3,), dtype),
            windows=ScaleWindows.init(dtype),
            Posgv=jnp.zeros((3,), dtype),
        )


# Packed nav-log row layout (device-resident log ring; one row appended
# per step so the host fetches the whole run in ONE transfer — per-frame
# D2H fetches are catastrophically slow on the target runtime, see
# io/logger.py). Padded to 64 lanes. `imu_dbg` carries the VI filter
# internals the reference dumps per frame (rebvo_third_t.cpp:283-299):
# rows giro, acel, cacel, dgiro, GBias, dWv, dWgv, VBias, Av, As, Posgv.
NAVLOG_WIDTH = 64
IMU_DBG_ROWS = ("giro", "acel", "cacel", "dgiro", "GBias", "dWv", "dWgv",
                "VBias", "Av", "As", "Posgv")
NAVLOG_FIELDS = (
    ("t", 1), ("dt", 1), ("RotLie", 3), ("Vel", 3), ("PoseLie", 3),
    ("Pos", 3), ("g", 3), ("scale", 1), ("ok", 1), ("kl_num", 1),
    ("klm_num", 1), ("s_rho_q", 1), ("score", 1), ("stereo_num", 1),
    ("kf_id", 1), ("kf_back_m", 1), ("kf_saved", 1),
    ("Kp", 1), ("RKp", 1), ("imu_dbg", 3 * len(IMU_DBG_ROWS)),
)


def pack_nav_row(out: "FrameOutput") -> Array:
    nav = out.nav
    dt = nav.t.dtype
    parts = [
        nav.t[None], nav.dt[None], nav.RotLie, nav.Vel, nav.PoseLie,
        nav.Pos, nav.g, nav.scale[None],
        nav.estimation_ok.astype(dt)[None], nav.kl_num.astype(dt)[None],
        nav.klm_num.astype(dt)[None], out.s_rho_q[None], out.score[None],
        out.stereo_num.astype(dt)[None], out.kf_id.astype(dt)[None],
        out.kf_back_m.astype(dt)[None], out.kf_saved.astype(dt)[None],
        out.Kp[None], out.RKp[None], out.imu_dbg.reshape(-1),
    ]
    row = jnp.concatenate(parts)
    return jnp.pad(row, (0, NAVLOG_WIDTH - row.shape[0]))


def unpack_nav_rows(rows) -> list:
    """Host-side: packed rows -> the RunLogger row-dict schema."""
    import numpy as np
    out = []
    for r in np.asarray(rows):
        d = {}
        o = 0
        for name, w in NAVLOG_FIELDS:
            d[name] = r[o] if w == 1 else np.asarray(r[o:o + w])
            o += w
        out.append(dict(
            t=float(d["t"]), dt=float(d["dt"]), RotLie=d["RotLie"],
            Vel=d["Vel"], PoseLie=d["PoseLie"], Pos=d["Pos"], g=d["g"],
            scale=float(d["scale"]), ok=bool(d["ok"] > 0),
            kl_num=int(d["kl_num"]), klm_num=int(d["klm_num"]),
            s_rho_q=float(d["s_rho_q"]), score=float(d["score"]),
            stereo_num=int(d["stereo_num"]), kf_id=int(d["kf_id"]),
            kf_back_m=int(d["kf_back_m"]), kf_saved=bool(d["kf_saved"] > 0),
            Kp=float(d["Kp"]), RKp=float(d["RKp"]),
            imu_dbg=np.asarray(d["imu_dbg"]).reshape(len(IMU_DBG_ROWS), 3),
        ))
    return out


class VOState(NamedTuple):
    """Carry state between frames (one sequence)."""

    klm: KeylineMap        # previous frame's edge map (post-processing)
    mask_img: Array        # [H, W] previous map's detection id mask
    field_img: Array       # [H, W] previous map's match field (reused by
                           # the field-sampled directed matcher)
    thresh: Array          # detector auto-threshold
    retuned: Array         # previous frame's re-tuned (top-K) threshold
    last_kl_num: Array     # keylines detected last frame
    thresh_pair: Array     # stereo-pair detector auto-threshold (the pair
                           # edge_finder's own state, rebvo_first_t.cpp:275)
    last_kl_num_pair: Array
    Vel: Array             # [3] warm-start translation
    W0: Array              # [3] warm-start rotation
    Kp: Array              # per-frame rescaling ratio
    P_Kp: Array
    K_scale: Array         # global metric scale (1 for vision-only)
    Pose: Array            # [3,3] global rotation
    Pos: Array             # [3] global position
    t: Array               # previous frame timestamp
    frame_count: Array     # int32 frames processed
    imu: ImuCarry
    kf: "KFCarry"          # active keyframe (1-slot dummy when
                           # TrackKeyFrames is off)
    navlog: Array          # [NavLogCap, 32] device-resident nav-log ring
    navlog_n: Array        # int32 rows written (can exceed the cap)
    G_gauge: Array         # cumulative rescaling ratio prod(Kp): tracks
                           # the mono depth-gauge drift (rho inflation);
                           # the exported trajectory MULTIPLIES by it
                           # (V_map = V_true/G) so displacements stay in
                           # the bootstrap gauge (GaugeExport). New
                           # capability over the reference, whose
                           # trajectory inherits the drift.
    VScaleC: Array         # stereo: integral velocity-scale correction.
                           # The edge-alignment cost is nearly |V|-flat
                           # at sub-pixel per-frame motion and settles
                           # shrunken; the pair-anchored scale residual
                           # (velocity_scale_refine) measures the
                           # remaining error each frame, attenuated by
                           # the matcher's near-prediction priority, so
                           # a PROPORTIONAL fix leaves a steady-state
                           # bias and injects per-frame scale noise.
                           # This integrator (C *= s_meas^alpha) drives
                           # the steady-state error to zero with the
                           # noise scaled down by alpha. 1.0 in mono.
    aR: Array              # [3,3] accumulated rotation since the scale-
                           # anchor epoch (long-baseline observer)
    aV: Array              # [3] accumulated translation since the epoch
    aAge: Array            # int32 frames since the epoch


class FrameOutput(NamedTuple):
    nav: NavData
    s_rho_q: Array
    score: Array
    rel_error: Array
    stereo_num: Array      # stereo matches this frame (0 in mono mode)
    kf_id: Array           # int32 active keyframe number (-1 = none)
    kf_back_m: Array       # int32 frame->KF matches surviving the prune
    kf_saved: Array        # bool — this frame was pushed as a keyframe
    W_X: Array             # [6,6] pose-estimator information of [V; W]
                           # (vision: final LM JtJ; VI: W_Xgv) — the
                           # quantity the reference transports into the
                           # pose graph (rebvo_second_t.cpp:326-334)
    Kp: Array              # per-frame rescaling ratio (Kp_cv)
    RKp: Array             # its variance estimate (RKp_cv)
    imu_dbg: Array         # [len(IMU_DBG_ROWS), 3] VI filter internals
                           # for the .m log census (zeros in mono mode)


def init_state(params: REBVOParameters, dtype=jnp.float32) -> VOState:
    K = params.KeylineMax
    H, W = params.ImageHeight, params.ImageWidth
    return VOState(
        klm=KeylineMap.empty(K, dtype=dtype),
        mask_img=jnp.full((H, W), -1, jnp.int32),
        field_img=jnp.full((H, W), -1, jnp.int32),
        thresh=jnp.asarray(params.DetectorThresh, dtype),
        retuned=jnp.zeros((), dtype),
        last_kl_num=jnp.zeros((), jnp.int32),
        thresh_pair=jnp.asarray(params.DetectorThresh, dtype),
        last_kl_num_pair=jnp.zeros((), jnp.int32),
        Vel=jnp.zeros((3,), dtype),
        W0=jnp.zeros((3,), dtype),
        Kp=jnp.ones((), dtype),
        P_Kp=jnp.asarray(5e-6, dtype),
        K_scale=jnp.ones((), dtype),
        Pose=jnp.eye(3, dtype=dtype),
        Pos=jnp.zeros((3,), dtype),
        t=jnp.zeros((), dtype),
        frame_count=jnp.zeros((), jnp.int32),
        imu=ImuCarry.make(params, dtype),
        kf=KFCarry.empty(K if params.TrackKeyFrames else 1, dtype=dtype),
        navlog=jnp.zeros((max(params.NavLogCap, 1), NAVLOG_WIDTH), dtype),
        navlog_n=jnp.zeros((), jnp.int32),
        G_gauge=jnp.ones((), dtype),
        VScaleC=jnp.ones((), dtype),
        aR=jnp.eye(3, dtype=dtype),
        aV=jnp.zeros((3,), dtype),
        aAge=jnp.zeros((), jnp.int32),
    )


class VOFrontend:
    """Binds the static configuration and exposes pure step functions.

    Usage:
        fe = VOFrontend(params)
        state = fe.init()
        state = fe.bootstrap(state, frame0, t0)          # detection only
        state, out = fe.step(state, frame, t)            # vision-only
        state, out = fe.step_imu(state, frame, t, imu)   # visual-inertial

    The `*_fn` attributes are the unjitted pure functions for vmap/pjit
    composition.
    """

    def __init__(self, params: REBVOParameters, cam: CameraModel = None):
        self.params = params
        self.cam = cam if cam is not None else CameraModel.from_params(params)
        if params.UsePallas >= 0:
            self.use_pallas = bool(params.UsePallas)
        else:
            self.use_pallas = jax.default_backend() == "tpu"
        # Stereo twin (rebvo_second_t.cpp:465-485). Extrinsics come from
        # config — deliberately NOT the reference's hard-coded EuRoC values
        # (its :467-470 bug) — stored as Python float tuples so the jitted
        # step closes over HLO literals, never device arrays (see
        # tests/test_no_captured_consts.py).
        self.stereo = bool(params.StereoAvaiable)
        if self.stereo:
            self.cam_pair = CameraModel.from_params(params, stereo=True)
            R01, t01 = params.stereo_extrinsics()
            self._R01 = tuple(tuple(float(v) for v in row) for row in R01)
            self._t01 = tuple(float(v) for v in t01)
        self.step = jax.jit(self.step_fn)
        self.step_imu = jax.jit(self.step_imu_fn)
        self.bootstrap = jax.jit(self.bootstrap_fn)
        # donated variants for serial drivers (run_vo, bench): the input
        # state's buffers (keyline SoA, mask/field images, nav-log ring —
        # several MB) are reused for the outputs instead of freshly
        # allocated every frame, cutting allocator pressure and HBM
        # traffic in the latency path. Callers must not touch the old
        # state after stepping.
        self.step_donated = jax.jit(self.step_fn, donate_argnums=(0,))
        self.step_imu_donated = jax.jit(self.step_imu_fn,
                                        donate_argnums=(0,))
        # multi-frame step: one dispatch advances the state over a CHUNK
        # of frames via lax.scan — the serial path's host dispatch
        # overhead (~0.4 ms/step on this runtime, more than the 0.3 ms
        # device step itself) is amortised chunk-fold. Offline replay
        # (run_vo --chunk, bench serial) uses this; live streaming keeps
        # the per-frame entry points.
        self.step_scan = jax.jit(self.step_scan_fn, donate_argnums=(0,))

    def init(self) -> VOState:
        return init_state(self.params)

    # ------------------------------------------------------------------

    def _detect_with(self, frame: Array, thresh0: Array, last_kl_num: Array,
                     cam: CameraModel):
        p = self.params
        thresh = update_detector_threshold(
            thresh0, last_kl_num, p.ReferencePoints,
            p.DetectorAutoGain, p.DetectorMaxThresh, p.DetectorMinThresh)
        if self.use_pallas:
            # fused frame -> candidates: the scale-space images never
            # leave VMEM (kernels/pallas_scale_space.py)
            from rebvo_tpu.kernels.edge_detect import compact_keylines
            from rebvo_tpu.kernels.pallas_scale_space import \
                detect_candidates_pallas
            cand = detect_candidates_pallas(
                frame, thresh, sigma0=p.Sigma0, k_sigma=p.KSigma,
                win_s=p.DetectorPlaneFitSize,
                per_hist=p.DetectorPosNegThresh,
                dog_thresh=p.DetectorDoGThresh,
                max_img_value=MAX_IMG_VALUE)
            klm, mask_img, kl_num = compact_keylines(
                cand, K=p.KeylineMax, kl_max=p.MaxPoints,
                cx=cam.cx, cy=cam.cy)
        else:
            ss = build_scale_space(frame, p.Sigma0, p.KSigma, 3)
            klm, mask_img, kl_num = detect_keylines(
                ss, thresh, K=p.KeylineMax, kl_max=p.MaxPoints,
                win_s=p.DetectorPlaneFitSize,
                per_hist=p.DetectorPosNegThresh,
                dog_thresh=p.DetectorDoGThresh, max_img_value=MAX_IMG_VALUE,
                cx=cam.cx, cy=cam.cy)
        retuned = re_estimate_thresh(klm, p.TrackPoints, p.QCutOffNumBins)
        return klm, mask_img, kl_num, thresh, retuned

    def _detect(self, state: VOState, frame: Array):
        return self._detect_with(frame, state.thresh, state.last_kl_num,
                                 self.cam)

    def _detect_pair(self, state: VOState, frame_pair: Array):
        """Stereo-pair detection twin (rebvo_first_t.cpp:275-290): its own
        auto-threshold carry, the pair camera's intrinsics."""
        return self._detect_with(frame_pair, state.thresh_pair,
                                 state.last_kl_num_pair, self.cam_pair)

    def bootstrap_fn(self, state: VOState, frame: Array, t: Array,
                     frame_pair: Array = None) -> VOState:
        """Process the first frame: detection only (the reference's dummy
        first-frame consume, rebvo_second_t.cpp:108-122)."""
        klm, mask_img, kl_num, thresh, retuned = self._detect(state, frame)
        field_img = build_field(
            klm, retuned,
            radius=min(self.params.FieldRadius, self.params.SearchRange),
            height=self.cam.height, width=self.cam.width)
        state = state._replace(
            klm=klm, mask_img=mask_img, field_img=field_img, thresh=thresh,
            retuned=retuned, last_kl_num=kl_num,
            t=jnp.asarray(t, state.t.dtype),
            frame_count=state.frame_count + 1)
        if self.stereo and frame_pair is not None:
            # advance the pair detector's threshold loop from frame 0
            _, _, kl_num_p, thresh_p, _ = self._detect_pair(state, frame_pair)
            state = state._replace(thresh_pair=thresh_p,
                                   last_kl_num_pair=kl_num_p)
        return state

    # ------------------------------------------------------------------

    def _front(self, state: VOState, frame: Array):
        """Detection + quantile + match field (shared by both modes)."""
        p = self.params
        cam = self.cam
        new_klm, new_mask, kl_num, thresh, retuned = self._detect(state, frame)
        s_rho_q = estimate_quantile(
            state.klm, percentile=p.QCutOffQuantile, nbins=p.QCutOffNumBins)
        field_img = build_field(
            new_klm, retuned, radius=min(p.FieldRadius, p.SearchRange),
            height=cam.height, width=cam.width)
        fv = FieldView.from_map(field_img, new_klm)
        return (new_klm, new_mask, kl_num, thresh, retuned, s_rho_q, fv,
                field_img)

    def _solver_vote_mask(self, old: KeylineMap):
        """Stereo mode: restrict the pose solver's cost vote to the
        pair-anchored keylines whenever enough exist (falls back to the
        full map below GlobalMatchThreshold anchored, e.g. at frame 1 or
        when the pair stream drops). None in mono mode (no-op)."""
        if not self.stereo:
            return None
        anchored = old.valid & old.anchored
        enough = jnp.sum(anchored) >= jnp.asarray(
            self.params.GlobalMatchThreshold, jnp.int32)
        return jnp.where(enough, anchored, old.valid)

    def _stereo_front(self, state: VOState, frame_pair):
        """Detect the stereo pair frame (when stereo is configured and a
        pair frame was supplied); returns the _tail stereo bundle plus the
        pair detector's threshold-carry updates."""
        if not (self.stereo and frame_pair is not None):
            return None, state.thresh_pair, state.last_kl_num_pair
        klm1, mask1, kl_num_p, thresh_p, _ = self._detect_pair(state,
                                                               frame_pair)
        return (klm1, mask1), thresh_p, kl_num_p

    def _tail(self, state: VOState, detection, V, P_V, R, nan_fail,
              stereo=None, extra_ok=None):
        """Directed matching, depth filtering, and (stereo) depth fusion
        or (mono) rescaling — shared by both modes. The caller has already
        merged all forward rotations into state.klm. `stereo` is the pair
        detection bundle (klm1, mask1) when StereoAvaiable."""
        p = self.params
        cam = self.cam
        dt_f = V.dtype
        (new_klm, new_mask, kl_num, thresh, retuned, s_rho_q, fv,
         field_img) = detection

        def _match(Vm):
            if p.MatchFieldStride > 0:
                stride = p.MatchFieldStride
                steps = int(p.SearchRange / stride) + 3
                return directed_matching_field(
                    new_klm, state.klm, state.field_img, Vm, P_V, R,
                    zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
                    width=cam.width, height=cam.height,
                    max_steps=steps, stride=stride,
                    min_thr_mod=p.MatchThreshModule,
                    min_thr_ang=p.MatchThreshAngle,
                    max_radius=float(p.SearchRange),
                    loc_uncertainty=p.LocationUncertaintyMatch)
            return directed_matching(
                new_klm, state.klm, state.mask_img, Vm, P_V, R,
                zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
                width=cam.width, height=cam.height,
                max_steps=p.MatchMaxSteps,
                min_thr_mod=p.MatchThreshModule,
                min_thr_ang=p.MatchThreshAngle,
                max_radius=float(p.SearchRange),
                loc_uncertainty=p.LocationUncertaintyMatch)

        C_vel = state.VScaleC
        rescale_on = stereo is not None and p.StereoVelRescale
        if rescale_on:
            # Stereo translation-scale architecture. The edge-alignment
            # cost is nearly FLAT in |V| at sub-pixel per-frame motion
            # (measured: <4% cost change between 0.5x and 1x the true
            # translation on loop_st), so the solver's magnitude is
            # noise that drifts shrunken; left alone the whole system
            # co-adapts to it (measured 13x trajectory shrink). Post-
            # bootstrap, the solver therefore keeps only DIRECTION
            # authority; the magnitude is a carried state steered in
            # closed loop by two pair-anchored observers:
            #   * velocity_scale_refine — per-frame, prediction-relative
            #     (mean-reverting, gain 0.3);
            #   * anchor_scale_measure — every StereoScaleBaseFrames
            #     frames over the accumulated motion, where the scale is
            #     strongly observable (gain 1: truth injection).
            # During bootstrap (first BootstrapRescaleFrames) the solver
            # keeps magnitude authority times the VScaleC integrator —
            # dynamics are too fast for the carry there.
            boot = state.frame_count <= p.BootstrapRescaleFrames
            mag_prev = jnp.linalg.norm(state.Vel)
            # C scales the raw solver velocity: the solver's absolute
            # magnitude is biased (flat cost) but its frame-to-frame
            # RELATIVE change tracks real accelerations, so C x solver
            # keeps the dynamics while the epoch observer trims C. The
            # relative leash bounds single-frame magnitude jumps.
            V = V * C_vel
            mag_raw = jnp.linalg.norm(V)
            leash_ok = (~boot) & (mag_prev > 1e-8) & (mag_raw > 1e-12)
            mag_cl = jnp.clip(mag_raw, 0.7 * mag_prev, 1.4 * mag_prev)
            V = jnp.where(leash_ok,
                          V * (mag_cl / jnp.maximum(mag_raw, 1e-12)), V)

        dres = _match(V)
        klm_num = dres.nmatch

        match_fail = klm_num < p.GlobalMatchThreshold
        est_ok = (~nan_fail) & (~match_fail)
        if extra_ok is not None:
            est_ok = est_ok & extra_ok

        if rescale_on:
            from rebvo_tpu.kernels.stereo import (anchor_scale_measure,
                                                  velocity_scale_refine)
            s_meas, n_sc = velocity_scale_refine(
                dres.new, state.klm, V, cam.zfm,
                k_px=float(p.LocationUncertaintyMatch) / 2.0)
            s_meas = jnp.where(est_ok & (n_sc >= 100), s_meas, 1.0)
            aV_cur = R.T @ state.aV + V
            aR_cur = R.T @ state.aR
            s_long, n_long, b_med = anchor_scale_measure(
                dres.new, aR_cur, aV_cur, cam.zfm)
            # Age-based epochs (a signal-based gate was tried and is
            # self-referential through the matcher's prediction
            # attenuation — both under- and over-estimates pull the
            # measured displacement toward themselves).
            at_epoch = state.aAge >= p.StereoScaleBaseFrames
            s_long = jnp.where(
                est_ok & (state.aAge >= 4) & (n_long >= 50),
                s_long, 1.0)
            # Post-bootstrap only the EPOCH observer drives the level:
            # the per-frame ratio is biased ~7% low by the matcher's
            # near-prediction attenuation (measured s_meas ~0.93 at a
            # correct magnitude), which at any nonzero gain leaks a
            # steady downward drift between epochs.
            # The accumulated-motion reading lags the current magnitude
            # by ~half the anchor age (it averages over the window), so
            # a flat high loop gain rings in a ~4x-delay limit cycle
            # (measured on dolly_st at gain 0.8 with the early 4-dof
            # measurement: ratio swinging 0.24-7.05, ~28-frame period),
            # while a flat low gain lets a persistent solver drift hold
            # a bias (loop_st at 0.15: align 1.26). With the 6-dof
            # anchor refinement the readings are clean enough for a
            # strong out-of-band gain; the deadband keeps reading noise
            # from churning the level once it is within ~5%.
            s_long_exp = jnp.where(jnp.abs(s_long - 1.0) > 0.05,
                                   0.8, 0.25)
            s_long_exp = jnp.maximum(s_long_exp, jnp.where(
                state.frame_count <= 3 * p.BootstrapRescaleFrames,
                0.5, 0.0))
            upd = s_meas ** jnp.where(boot, 0.6, 0.0) * s_long ** s_long_exp
            upd = jnp.where(est_ok, jnp.clip(upd, 0.5, 2.0), 1.0)
            V = V * upd
            C_vel = jnp.clip(C_vel * upd, 0.05, 50.0)
            # log-domain EMA of the applied magnitude: the solver's
            # frame-to-frame magnitude noise (~10-15%) otherwise passes
            # straight into the trajectory as scale wobble that the
            # Sim(3) ATE cannot align away; beta=0.4 filters it to ~6%
            # while real accelerations are followed with a ~2-frame lag
            mag2 = jnp.linalg.norm(V)
            sm_ok = leash_ok & est_ok & (mag2 > 1e-12)
            mag_sm = mag_prev ** 0.65 * jnp.maximum(mag2, 1e-12) ** 0.35
            V = jnp.where(sm_ok, V * (mag_sm / jnp.maximum(mag2, 1e-12)),
                          V)
            if __import__("os").environ.get("REBVO_DEBUG_SVEL"):
                jax.debug.print(
                    "age={a} ep={e} s_meas={s} n_sc={n} s_long={sl} "
                    "n_long={nl} C={c}",
                    a=state.aAge, e=at_epoch, s=s_meas, n=n_sc,
                    sl=s_long, nl=n_long, c=C_vel)
            # epoch bookkeeping: compose this frame's (refined) motion;
            # reset at the epoch boundary
            aV_cur = R.T @ state.aV + V
            eye3 = jnp.eye(3, dtype=V.dtype)
            aR_new = jnp.where(at_epoch, eye3, aR_cur)
            aV_new = jnp.where(at_epoch, jnp.zeros((3,), V.dtype), aV_cur)
            aAge_new = jnp.where(at_epoch, 0, state.aAge + 1)
        else:
            at_epoch = jnp.asarray(False)
            aR_new, aV_new, aAge_new = state.aR, state.aV, state.aAge

        new_map = dres.new
        if p.SeedRhoMapMedian and stereo is not None:
            # Gauge-coherent birth depth: fresh keylines (no backward
            # match) start at the median rho of the mature population
            # instead of the reference's fixed RhoInit=1
            # (edge_finder.h:42). A fixed far-from-population seed keeps
            # re-injecting a second gauge every frame; the pose solver
            # then splits the difference between the two populations and
            # systematically shrinks V (measured 13x on loop_st, where
            # stereo fusion pins the mature population metric). Falls
            # back to RhoInit while nothing is mature (bootstrap), and
            # s_rho stays at RHO_MAX so the seed carries no false
            # confidence.
            mature = new_map.valid & (new_map.m_num > 0)
            seed = jnp.clip(
                _masked_median(new_map.rho, mature, fallback=RHO_INIT),
                RHO_MIN, RHO_MAX)
            fresh = new_map.valid & (new_map.m_num == 0)
            new_map = new_map._replace(
                rho=jnp.where(fresh, seed, new_map.rho),
                rho0=jnp.where(fresh, seed, new_map.rho0))

        proc, _ = regularize_1_iter(new_map, p.RegularizeThresh)
        proc = depth_ekf(proc, V, cam.zfm,
                         reshape_q_abs=p.ReshapeQAbsolute,
                         loc_uncertainty=p.LocationUncertainty)

        stereo_num = jnp.zeros((), jnp.int32)
        if stereo is not None:
            # Stereo depth: epipolar match against the pair map, fuse the
            # closed-form pair depth with the mono EKF, and pin the gauge
            # (Kp=1, no rescaling) — rebvo_second_t.cpp:465-489.
            from rebvo_tpu.kernels.stereo import (directed_matching_stereo,
                                                  fuse_stereo_depth)
            klm1, mask1 = stereo
            cp = self.cam_pair
            sres = directed_matching_stereo(
                proc, klm1, mask1,
                jnp.asarray(self._t01, dt_f), jnp.asarray(self._R01, dt_f),
                zf0=cam.zfm, zf1=cp.zfm, cx1=cp.cx, cy1=cp.cy,
                width=cam.width, height=cam.height,
                max_steps=p.StereoMatchMaxSteps,
                min_thr_mod=p.MatchThreshModule,
                min_thr_ang=p.MatchThreshAngle,
                max_radius=float(p.StereoSearchRange),
                loc_uncertainty=p.LocationUncertaintyMatch,
                prior_window=bool(p.StereoPriorWindow))
            # Bootstrap re-gauge to the METRIC stereo gauge (beyond the
            # reference, which only information-fuses per keyline —
            # leaving the map near the arbitrary mono bootstrap gauge,
            # since the converged mono sigma quickly out-weighs the pair
            # depth): during the first frames, measure the global ratio
            # g between the map's rho and the pair-geometry rho over the
            # stereo matches and rescale the WHOLE map by it. The map
            # lands baseline-metric before the mono EKF tightens, the
            # fusion then refines consistently, and in VI mode the scale
            # filter initialises against a gauge that is already ~1.
            # The ratio is the MEDIAN over matched pairs — a one-shot
            # robust gauge. (The round-4 information-weighted LS ratio
            # was dominated by already-fused small-sigma keylines, so the
            # correction converged over ~11 frames; meanwhile the map
            # held two inconsistent depth populations, which is exactly
            # the regime where the pose solver collapses V — measured
            # V/V_gt = 1/61 at frame 2 of loop_st.)
            gauge_div = jnp.ones((), dt_f)
            if p.BootstrapRescaleFrames > 0:
                hasm = (sres.stereo_m_id >= 0) & proc.valid & \
                    (sres.stereo_rho > RHO_MIN)
                g_st = _masked_median(
                    proc.rho / jnp.maximum(sres.stereo_rho, RHO_MIN), hasm)
                g_st = jnp.clip(g_st, 1e-3, 1e3)
                boot_st = (state.frame_count <= p.BootstrapRescaleFrames) \
                    & (sres.nmatch > p.GlobalMatchThreshold) \
                    & (jnp.abs(g_st - 1.0) > 0.05) & est_ok
                div_st = jnp.where(boot_st, g_st, 1.0)
                proc = proc._replace(rho=proc.rho / div_st,
                                     s_rho=proc.s_rho / div_st)
                gauge_div = div_st
            proc = fuse_stereo_depth(proc, sres.stereo_m_id,
                                     sres.stereo_rho, sres.stereo_s_rho)
            # Pair-anchored flags for the NEXT frame's pose-solver vote
            # (KeylineMap.anchored): only depths the pair measured this
            # frame may vote on the motion; mono-EKF depths co-adapt to
            # the solver's own gauge and would sustain a shrunken-V
            # fixed point (measured: V/V_gt 1/6 with a metric-median
            # map on loop_st).
            has_st = (sres.stereo_m_id >= 0) & proc.valid
            proc = proc._replace(
                anchored=has_st,
                rho_st=jnp.where(has_st, sres.stereo_rho, 0.0))
            if p.StereoVelRescale:
                # scale-anchor epoch reset: re-anchor every keyline that
                # has a fresh pair depth at its CURRENT position
                proc = proc._replace(
                    ax=jnp.where(at_epoch, proc.px, proc.ax),
                    ay=jnp.where(at_epoch, proc.py, proc.ay),
                    arho=jnp.where(
                        at_epoch,
                        jnp.where(has_st, sres.stereo_rho, 0.0),
                        proc.arho))
            stereo_num = sres.nmatch
            Kp_new = jnp.ones((), dt_f)
            P_Kp_new = state.P_Kp
        else:
            # Bootstrap rescale warm-up: during the first frames the
            # velocity/depth co-adaptation moves the free mono gauge a
            # lot in single-frame jumps (measured frame-1 Kp = 3.6 on
            # the parity scenes vs the reference's 1.4); applying the
            # rescale (the reference's DoReScaling mechanism,
            # edge_tracker.cpp:1131-1136) during bootstrap pins the map
            # at the RhoInit gauge, which (a) kills the slow post-
            # bootstrap drift caused by fresh keylines injecting
            # RhoInit=1 into a far-from-1 population and (b) hands the
            # VI scale filter a stable gauge from its first frame.
            # ... VI only: the warm-up exists to hand the SCALE FILTER a
            # stable gauge (its alpha prior freezes right after init, so
            # a moving gauge at turn-on locks a wrong K for hundreds of
            # frames — measured lateral_arc_vi: align scale 0.62 without
            # vs 0.98 with). Mono exports are Sim(3)-gauge-free and
            # measure slightly better without the extra multiplicative
            # noise, so they keep the reference-exact no-rescale path.
            gauge_div = jnp.ones((), dt_f)
            proc, Kp_new, P_Kp_new = estimate_rescaling_opt(
                proc, apply=False)
            if p.ImuMode > 0 and p.BootstrapRescaleFrames > 0:
                boot = state.frame_count <= p.BootstrapRescaleFrames
                # only while the gauge is actually MOVING: applying the
                # (noisy) Kp on settled frames injects multiplicative
                # depth noise for no benefit. The transient shows up as
                # large single-frame ratios; 5% is well above the
                # settled Kp noise (~0.1-0.5%).
                moving = jnp.abs(Kp_new - 1.0) > 0.05
                apply_res = jnp.asarray(bool(p.DoReScaling)) | \
                    (boot & moving & est_ok)
            else:
                apply_res = jnp.asarray(bool(p.DoReScaling))
            div = jnp.where(apply_res, Kp_new, 1.0)
            proc = proc._replace(rho=proc.rho / div,
                                 s_rho=proc.s_rho / div)

        new_final = jax.tree_util.tree_map(
            lambda a, b: jnp.where(est_ok, a, b), proc, dres.new)
        Kp = jnp.where(est_ok, Kp_new, 1.0)
        if stereo is None:
            # gauge bookkeeping must skip frames whose creep was removed
            # from the map itself by the applied rescale
            Kp_gauge = jnp.where(apply_res, 1.0, Kp)
        else:
            Kp_gauge = jnp.ones((), dt_f)
        P_Kp = jnp.where(nan_fail, BIG, jnp.where(match_fail, 10.0, P_Kp_new))
        V_out = jnp.where(est_ok, V, 0.0)
        # gauge_div: factor the map's inverse depths were DIVIDED by this
        # frame (stereo bootstrap re-gauge). Pixel displacement goes as
        # rho*V, so the warm-start velocity the caller carries must be
        # MULTIPLIED by the same factor — leaving it in the old gauge
        # after a large one-shot re-gauge strands the next frame's solver
        # in the shrunken-translation local minimum (pose_solver.py
        # docstring; measured V collapse x10 at loop_st frame 2).
        return (new_final, klm_num, est_ok, Kp, Kp_gauge, P_Kp, V_out,
                s_rho_q, stereo_num, gauge_div, C_vel,
                aR_new, aV_new, aAge_new)

    # ------------------------------------------------------------------
    # Vision-only path (rebvo_second_t.cpp:338-382 + common tail)
    # ------------------------------------------------------------------

    def step_scan_fn(self, state: VOState, frames: Array, ts: Array,
                     ) -> Tuple[VOState, FrameOutput]:
        """Advance over a chunk of frames ([N,H,W] + [N] timestamps) in
        ONE compiled dispatch (lax.scan over step_fn); returns the final
        state and the N stacked per-frame outputs."""
        def body(st, ft):
            f, t = ft
            return self.step_fn(st, f, t)
        return jax.lax.scan(body, state, (frames, ts))

    def step_fn(self, state: VOState, frame: Array, t: Array,
                frame_pair: Array = None) -> Tuple[VOState, FrameOutput]:
        p = self.params
        cam = self.cam
        dt_f = state.Vel.dtype
        t = jnp.asarray(t, dt_f)
        dt_frame = t - state.t
        dt_frame = jnp.where(dt_frame < 0.001, 1.0 / p.config_fps, dt_frame)

        detection = self._front(state, frame)
        (new_klm, new_mask, kl_num, thresh, retuned, s_rho_q, fv,
         field_img) = detection
        stereo, thresh_pair, kl_num_pair = self._stereo_front(state,
                                                              frame_pair)
        old = state.klm

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
            init_type=p.TrackerInitType,
            vote_mask=self._solver_vote_mask(old))

        nan_fail = jnp.any(~jnp.isfinite(mres.Vel)) | \
            jnp.any(~jnp.isfinite(mres.W0))
        V = jnp.where(nan_fail, 0.0, mres.Vel)
        W = jnp.where(nan_fail, 0.0, mres.W0)
        P_V = jnp.where(nan_fail, jnp.eye(3, dtype=dt_f) * BIG, mres.RVel)

        new_fm, _ = forward_match(old, new_klm, mres.m_id_f)

        R0 = so3_exp(W)
        R = R0.T
        old_rot = self._rotate_map(old, R0)
        state2 = state._replace(klm=old_rot)
        detection2 = (new_fm,) + detection[1:]

        (new_final, klm_num, est_ok, Kp, Kp_gauge, P_Kp, V_out, s_rho_q,
         stereo_num, gauge_div, C_vel, aR_new, aV_new,
         aAge_new) = self._tail(
            state2, detection2, V, P_V, R, nan_fail, stereo=stereo)

        K_scale = state.K_scale
        Pose = state.Pose @ R
        # Gauge-consistent export (mono): as the depth EKF converges, the
        # map's free monocular gauge creeps and the integrated
        # trajectory inherits it. Kp = EstimateReScalingOpt's
        # updated/predicted inverse-depth ratio measures the per-frame
        # rho inflation; inflated rho means shrunken map distances, so
        # the estimated translation scales as V_true / G. MULTIPLYING
        # the exported displacement by the cumulative product G
        # re-expresses every step in the bootstrap gauge (measured on
        # loop: raw exported gauge decays x0.90 over frames 50-200
        # while G grows x1.08 — the product is flat). Internal visual
        # quantities (V warm start, matching, depth) stay in the map
        # gauge.
        # TrackKeyFrames composes with this: the keyframe stores its
        # capture-time gauge factor (KFCarry.G) and the re-anchor
        # converts translations through it, so the anchor and the
        # export share one (bootstrap) gauge.
        if self.params.GaugeExport:
            G_gauge = jnp.clip(state.G_gauge * Kp_gauge, 1e-4, 1e4)
        else:
            G_gauge = state.G_gauge
        Pos = state.Pos - Pose @ (V_out * K_scale * G_gauge)

        (kf_carry, new_final, Pose, Pos, kf_id, kf_back_m,
         kf_saved) = self._kf_track(state, new_final, fv, Pose, Pos,
                                    K_scale, kl_num, s_rho_q, est_ok,
                                    G_gauge)

        nav = NavData(
            t=t, dt=dt_frame, Rot=R, RotLie=so3_log(R),
            Vel=-V_out * K_scale * G_gauge / dt_frame,
            Pose=Pose, PoseLie=so3_log(Pose), Pos=Pos,
            g=jnp.zeros((3,), dt_f), scale=K_scale,
            estimation_ok=est_ok, kl_num=kl_num, klm_num=klm_num)

        W_X_out = jnp.where(nan_fail, jnp.eye(6, dtype=dt_f) * 1e-12,
                            mres.W_X)
        out = FrameOutput(nav=nav, s_rho_q=s_rho_q, score=mres.score,
                          rel_error=mres.rel_error, stereo_num=stereo_num,
                          kf_id=kf_id, kf_back_m=kf_back_m,
                          kf_saved=kf_saved, W_X=W_X_out, Kp=Kp, RKp=P_Kp,
                          imu_dbg=jnp.zeros((len(IMU_DBG_ROWS), 3), dt_f))
        navlog, navlog_n = self._log_nav(state, out)
        new_state = VOState(
            klm=new_final, mask_img=new_mask, field_img=field_img,
            thresh=thresh, retuned=retuned, last_kl_num=kl_num,
            thresh_pair=thresh_pair, last_kl_num_pair=kl_num_pair,
            Vel=V_out * gauge_div, W0=W, Kp=Kp, P_Kp=P_Kp,
            K_scale=K_scale, Pose=Pose,
            Pos=Pos, t=t, frame_count=state.frame_count + 1, imu=state.imu,
            kf=kf_carry, navlog=navlog, navlog_n=navlog_n,
            G_gauge=G_gauge, VScaleC=C_vel,
            aR=aR_new, aV=aV_new, aAge=aAge_new)
        return new_state, out

    # ------------------------------------------------------------------
    # Visual-inertial path (rebvo_second_t.cpp:182-335, 528-546)
    # ------------------------------------------------------------------

    def step_imu_fn(self, state: VOState, frame: Array, t: Array,
                    win: ImuWindow,
                    R_cam2imu: Array = None, T_cam2imu: Array = None,
                    frame_pair: Array = None,
                    ) -> Tuple[VOState, FrameOutput]:
        p = self.params
        cam = self.cam
        dt_f = state.Vel.dtype
        t = jnp.asarray(t, dt_f)
        dt_frame = t - state.t
        dt_frame = jnp.where(dt_frame < 0.001, 1.0 / p.config_fps, dt_frame)
        eye3 = jnp.eye(3, dtype=dt_f)
        if R_cam2imu is None:
            R_cam2imu = eye3
        if T_cam2imu is None:
            T_cam2imu = jnp.zeros((3,), dt_f)

        imu = integrate_window(win, R_cam2imu, T_cam2imu)
        ic = state.imu

        # --- Gyro-bias initialisation (rebvo_second_t.cpp:163-185).
        accumulating = (~ic.init) & (state.frame_count > 0)
        giro_init = jnp.where(accumulating, ic.giro_init + imu.giro * imu.dt,
                              ic.giro_init)
        g_init = jnp.where(accumulating, ic.g_init - imu.cacel, ic.g_init)
        n_init = jnp.where(accumulating, ic.n_init + 1, ic.n_init)
        done = accumulating & (n_init > p.InitBiasFrameNum)
        nf = jnp.maximum(n_init, 1).astype(dt_f)
        Bg = jnp.where(done, giro_init / nf, ic.Bg)
        W_Bg = jnp.where(
            done,
            jnp.linalg.inv(eye3 * (p.GiroBiasStdDev ** 2 *
                                   dt_frame * dt_frame * 1e2)),
            ic.W_Bg)
        X7 = jnp.where(done, ic.X7.at[1:4].set(g_init / nf), ic.X7)
        init = ic.init | done
        if p.InitBias == 0:
            init = jnp.asarray(True)
            Bg = jnp.asarray([p.BiasHintX, p.BiasHintY, p.BiasHintZ],
                             dt_f) * imu.dt

        # --- IMU pre-rotation (rebvo_second_t.cpp:206-211):
        # R^T = SO3(Bg) @ Rot^T  ->  R = Rot @ SO3(Bg)^T.
        R = imu.Rot @ so3_exp(Bg).T
        old_pre = self._rotate_map(state.klm, R.T)

        detection = self._front(state._replace(klm=old_pre), frame)
        (new_klm, new_mask, kl_num, thresh, retuned, s_rho_q, fv,
         field_img) = detection
        stereo, thresh_pair, kl_num_pair = self._stereo_front(state,
                                                              frame_pair)

        match_num_min = jnp.minimum(
            jnp.asarray(p.MatchNumThresh, jnp.int32),
            state.frame_count.astype(jnp.int32))

        # IMU-propagated warm start: an accelerating rig changes the
        # per-frame displacement by (specific force + gravity)*dt_frame^2;
        # propagating the previous visual displacement by the accel
        # increment keeps the minimizer's init inside the correct basin
        # of the (locally multi-modal) edge-alignment cost even under
        # acceleration, where a plain previous-velocity init falls
        # behind and locks onto a shrunken solution. VO-gauge units:
        # world accel / K_scale; back-displacement convention: minus.
        filter_live = state.frame_count > (4 + p.InitBiasFrameNum)
        dv_imu = -(imu.cacel + ic.g_est) * dt_frame * dt_frame / \
            jnp.maximum(state.K_scale, jnp.asarray(1e-6, dt_f))
        dv_imu = jnp.where(filter_live & jnp.all(jnp.isfinite(dv_imu)),
                           dv_imu, jnp.zeros((3,), dt_f))
        Vg0 = (jnp.zeros((3,), dt_f) if p.TrackerInitType == 0
               else ic.Vg + dv_imu)
        vres = minimizer_v(
            Vg0, old_pre, fv,
            zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height,
            max_r=jnp.asarray(float(p.SearchRange), dt_f),
            match_thresh=p.TrackerMatchThresh, max_s_rho=s_rho_q,
            match_num_min=match_num_min, k_huber=p.ReweigthDistance,
            min_mod=state.retuned, iter_max=p.TrackerIterNum,
            vote_mask=self._solver_vote_mask(old_pre))
        Vg = vres.Vel
        P_Vg = vres.RVel

        new_fm, _ = forward_match(old_pre, new_klm, vres.m_id_f)

        # --- 6-dof linear correction + gyro fusion.
        ok_x, W_Xv, R_Xv, Xv = ext_rot_vel(
            new_fm, Vg, cam.zfm, p.LocationUncertainty, p.ReweigthDistance)
        RGBias = eye3 * (p.GiroBiasStdDev ** 2 * dt_frame * dt_frame)
        RGiro = eye3 * (p.GiroMeasStdDev ** 2 * dt_frame * dt_frame)
        Xgv, W_Xgv, dgbias, W_Bg2 = bias_correct(
            Xv, W_Xv, jnp.zeros((3,), dt_f), W_Bg, RGiro, RGBias)
        Bg = Bg + dgbias
        W_Bg = W_Bg2

        dVgv = Xgv[:3]
        dWgv = Xgv[3:]
        Rgva_pre = R
        R0 = so3_exp(dWgv)
        R = R @ R0.T                      # R^T = R0 @ R^T
        Vgv = R0 @ Vg + dVgv
        V = Vgv
        R_Xgv = jnp.linalg.inv(W_Xgv)
        P_V = R_Xgv[:3, :3]
        P_W = R_Xgv[3:, 3:]

        # --- Scale/gravity filter (rebvo_second_t.cpp:282-312).
        win1, Av = est_acel_lsq4(ic.windows, -Vgv / dt_frame, R, dt_frame)
        win2, As = mean_acel4(win1, imu.cacel, R)

        Rv = P_V / (dt_frame ** 4)
        Qrot = P_W
        QKp = state.P_Kp
        Qg = eye3 * (p.g_uncert ** 2)
        Rg_mod = jnp.asarray(p.g_module_uncer ** 2, dt_f)
        Rs = eye3 * (p.AcelMeasStdDev ** 2)
        Qbias = eye3 * (p.VBiasStdDev ** 2)

        filter_on = state.frame_count > (4 + p.InitBiasFrameNum)
        Kf, X7n, P7n, g_est, b_est, Xgva = est_ka_gmek_bias(
            As, Av, jnp.asarray(1.0, dt_f), R, X7, ic.P7,
            Qg, Qrot, Qbias, QKp, Rg_mod, Rs, Rv,
            W_Xgv, Xgv, p.g_module,
            nll_logdet=bool(p.ScaleFilterLogDet))
        K_scale = jnp.where(filter_on, Kf, state.K_scale)
        X7 = jnp.where(filter_on, X7n, X7)
        P7 = jnp.where(filter_on, P7n, ic.P7)
        g_est = jnp.where(filter_on, g_est, ic.g_est)
        b_est = jnp.where(filter_on, b_est, ic.b_est)

        dVgva = jnp.where(filter_on, Xgva[:3], dVgv)
        dWgva = jnp.where(filter_on, Xgva[3:], dWgv)
        R0gva = so3_exp(dWgva)
        Rgva = jnp.where(filter_on, Rgva_pre @ R0gva.T, R)
        Vgva = jnp.where(filter_on, R0gva @ Vg + dVgva, Vgv)

        # --- Second forward rotation of the old map.
        old_rot = self._rotate_map(old_pre, R0)
        state2 = state._replace(klm=old_rot)
        detection2 = (new_fm,) + detection[1:]

        nan_fail = jnp.any(~jnp.isfinite(V)) | (~ok_x)
        V = jnp.where(nan_fail, 0.0, V)
        P_V = jnp.where(nan_fail, eye3 * BIG, P_V)

        (new_final, klm_num, est_ok, Kp, Kp_gauge, P_Kp, V_out, s_rho_q,
         stereo_num, gauge_div, C_vel, aR_new, aV_new,
         aAge_new) = self._tail(
            state2, detection2, V, P_V, R, nan_fail, stereo=stereo)

        # --- Gravity-aligned pose integration (rebvo_second_t.cpp:528-546).
        u_est = Rgva.T @ ic.u_est
        u_est = u_est - (jnp.dot(u_est, g_est) /
                         jnp.maximum(jnp.dot(g_est, g_est), 1e-12)) * g_est
        u_norm = jnp.linalg.norm(u_est)
        u_est = u_est / jnp.where(u_norm > 1e-12, u_norm, 1.0)
        y_axis = jnp.asarray([0.0, 1.0, 0.0], dt_f)
        x_axis = jnp.asarray([1.0, 0.0, 0.0], dt_f)
        PoseP1 = rotation_between(g_est, y_axis)
        PoseP2 = rotation_between(PoseP1 @ u_est, x_axis)
        Pose_f = PoseP2 @ PoseP1
        Pos_f = state.Pos - Pose_f @ (Vgva * K_scale)
        Posgv = ic.Posgv - Pose_f @ (Vgv * K_scale)

        Pose = jnp.where(filter_on, Pose_f, state.Pose)
        Pos = jnp.where(filter_on, Pos_f, state.Pos)
        u_est = jnp.where(filter_on, u_est, ic.u_est)

        (kf_carry, new_final, Pose, Pos, kf_id, kf_back_m,
         kf_saved) = self._kf_track(state, new_final, fv, Pose, Pos,
                                    K_scale, kl_num, s_rho_q, est_ok,
                                    state.G_gauge)

        nav = NavData(
            t=t, dt=dt_frame, Rot=R, RotLie=so3_log(R),
            Vel=-V_out * K_scale / dt_frame,
            Pose=Pose, PoseLie=so3_log(Pose), Pos=Pos,
            g=g_est, scale=K_scale,
            estimation_ok=est_ok, kl_num=kl_num, klm_num=klm_num)

        imu_carry = ImuCarry(
            init=init, n_init=n_init, giro_init=giro_init, g_init=g_init,
            Bg=Bg, W_Bg=W_Bg, Vg=Vg * gauge_div, X7=X7, P7=P7, u_est=u_est,
            g_est=g_est, b_est=b_est, windows=win2, Posgv=Posgv)

        W_X_out = jnp.where(nan_fail, jnp.eye(6, dtype=dt_f) * 1e-12,
                            W_Xgv)
        # VI filter internals for the .m log (IMU_DBG_ROWS order;
        # rebvo_third_t.cpp:283-299 census)
        imu_dbg = jnp.stack([imu.giro, imu.acel, imu.cacel, imu.dgiro,
                             Bg, Xv[3:], dWgv, b_est, Av, As, Posgv])
        out = FrameOutput(nav=nav, s_rho_q=s_rho_q, score=vres.score,
                          rel_error=jnp.zeros((), dt_f),
                          stereo_num=stereo_num, kf_id=kf_id,
                          kf_back_m=kf_back_m, kf_saved=kf_saved,
                          W_X=W_X_out, Kp=Kp, RKp=P_Kp,
                          imu_dbg=imu_dbg.astype(dt_f))
        navlog, navlog_n = self._log_nav(state, out)
        new_state = VOState(
            klm=new_final, mask_img=new_mask, field_img=field_img,
            thresh=thresh, retuned=retuned, last_kl_num=kl_num,
            thresh_pair=thresh_pair, last_kl_num_pair=kl_num_pair,
            Vel=V_out * gauge_div, W0=dWgv, Kp=Kp, P_Kp=P_Kp,
            K_scale=K_scale,
            Pose=Pose, Pos=Pos, t=t, frame_count=state.frame_count + 1,
            imu=imu_carry, kf=kf_carry, navlog=navlog, navlog_n=navlog_n,
            G_gauge=state.G_gauge,   # VI: metric scale K owns the gauge
            VScaleC=C_vel,
            aR=aR_new, aV=aV_new, aAge=aAge_new)
        return new_state, out

    # ------------------------------------------------------------------

    def _log_nav(self, state: VOState, out: "FrameOutput"):
        """Append the packed nav row to the device-resident log ring."""
        if self.params.NavLogCap <= 0:
            return state.navlog, state.navlog_n
        cap = state.navlog.shape[0]
        row = pack_nav_row(out)
        navlog = jax.lax.dynamic_update_slice(
            state.navlog, row[None], (state.navlog_n % cap, 0))
        return navlog, state.navlog_n + 1

    def _kf_track(self, state: VOState, klm: KeylineMap, fv, Pose, Pos,
                  K_scale, kl_num, s_rho_q, est_ok, G_gauge):
        """Online keyframe tracking (TrackKeyFrames, statically gated):
        chain maintenance + pose re-anchor + keyframe switch."""
        if not self.params.TrackKeyFrames:
            z = jnp.zeros((), jnp.int32)
            return (state.kf, klm, Pose, Pos, jnp.asarray(-1, jnp.int32),
                    z, jnp.asarray(False))
        res = track_keyframe(
            state.kf, klm, fv, Pose, Pos, K_scale, kl_num, s_rho_q,
            est_ok, G_gauge, cam=self.cam, params=self.params)
        return (res.kf, res.klm, res.Pose, res.Pos, res.kf.count - 1,
                res.back_m, res.saved)

    def _rotate_map(self, klm: KeylineMap, R0: Array) -> KeylineMap:
        """Forward-rotate an edge map (edge_tracker::rotate_keylines)."""
        px, py, rho, s_rho = rotate_hom_points(
            R0, klm.px, klm.py, klm.rho, klm.s_rho, self.cam.zfm)
        gx, gy = rotate_gradients(R0, klm.gx, klm.gy)
        return klm._replace(px=px, py=py, rho=rho, s_rho=s_rho,
                            gx=gx, gy=gy)
