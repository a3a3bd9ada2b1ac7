"""Top-level VO/VIO system — the reference's `REBVO` class equivalent.

Mirrors the public API surface of the reference (include/rebvo/rebvo.h:
357-640): construct from a config file or parameter struct, feed frames
(dataset replay or pushed custom frames), push IMU samples, read the
latest nav state, request resets/snapshots, register an output callback.
The three POSIX threads collapse into: host-side frame feeding (with the
native prefetch loader) + the jitted device step + host-side output
(logging, keyframes, telemetry).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import numpy as np

from rebvo_tpu.config import REBVOParameters, load_config
from rebvo_tpu.frontend.imu import ImuWindow
from rebvo_tpu.frontend.step import VOFrontend
from rebvo_tpu.io.logger import RunLogger


class VOSystem:
    """End-to-end system: step + keyframes + pose log + telemetry."""

    def __init__(self, params: REBVOParameters = None,
                 config_path: str = None):
        if params is None:
            params = (load_config(config_path) if config_path
                      else REBVOParameters())
        self.params = params
        self.frontend = VOFrontend(params)
        self.state = self.frontend.init()
        self.logger = RunLogger()
        self.frame_count = 0
        self._nav_lock = threading.Lock()
        self._nav = None
        self._callback: Optional[Callable] = None
        self._reset_requested = False

        import jax.numpy as jnp
        self._jnp = jnp

        # keyframe store + pose-graph log (TrackKeyFrames path)
        self.kf_store = None
        self.pose_log = None
        self.kf_push_enabled = True   # toggleKeyFrames (rebvo.h:462)
        if params.TrackKeyFrames:
            from rebvo_tpu.backend.keyframe import KeyframeStore
            from rebvo_tpu.backend.posegraph import PoseGraphLog
            self.kf_store = KeyframeStore.empty(64, params.KeylineMax)
            self.pose_log = PoseGraphLog()

        # telemetry sender (VideoNetEnabled): edge map + encoded frame
        # (EncoderType selects raw/MJPEG, rebvo_third_t.cpp:117-143)
        self.sender = None
        if params.VideoNetEnabled:
            try:
                from rebvo_tpu.io.telemetry import EdgeMapSender
                self.sender = EdgeMapSender(
                    params.VideoNetHost, params.VideoNetPort,
                    params.ImageWidth, params.ImageHeight,
                    video_etype=params.EncoderType,
                    edgemap_delay=params.EdgeMapDelay)
            except Exception:
                self.sender = None

        # IMU sample buffer for pushIMU (the ImuGrabber role)
        self._imu_samples = []
        self._imu_lock = threading.Lock()
        self._R_c2i = jnp.eye(3)
        self._T_c2i = jnp.zeros(3)

    # -- reference API surface (rebvo.h names) --------------------------

    def pushIMU(self, t: float, gyro, accel) -> None:
        """Thread-safe IMU sample push (rebvo.h:534)."""
        with self._imu_lock:
            self._imu_samples.append(
                (float(t), np.asarray(gyro, np.float32),
                 np.asarray(accel, np.float32)))

    def setCamImuSE3(self, R, T) -> None:
        jnp = self._jnp
        self._R_c2i = jnp.asarray(R, jnp.float32)
        self._T_c2i = jnp.asarray(T, jnp.float32)

    def getNav(self):
        """Latest nav state (thread-safe; rebvo.h:497)."""
        with self._nav_lock:
            return self._nav

    def setOutputCallback(self, fn: Callable) -> None:
        self._callback = fn

    def Reset(self) -> None:
        """Depth/trajectory reset request (system_reset semantics)."""
        self._reset_requested = True

    def TakeSnapshot(self, kf_path: str = "kf_list.npz",
                     poses_path: str = "poses_list.npz") -> None:
        """Save keyframes + pose log (the 's' command,
        app/rebvorun/main.cpp:132-136)."""
        if self.kf_store is not None:
            from rebvo_tpu.backend.keyframe import save_keyframes
            save_keyframes(kf_path, self.kf_store)
        if self.pose_log is not None:
            self.pose_log.save(poses_path)

    # -- frame processing -----------------------------------------------

    def _collect_imu_window(self, t0: float, t1: float,
                            size: int = 32) -> ImuWindow:
        jnp = self._jnp
        p = self.params
        with self._imu_lock:
            sel = [(t, g, a) for (t, g, a) in self._imu_samples
                   if t0 < t <= t1]
            self._imu_samples = [s for s in self._imu_samples if s[0] > t1]
        n = min(len(sel), size)
        gyro = np.zeros((size, 3), np.float32)
        accel = np.zeros((size, 3), np.float32)
        for i in range(n):
            gyro[i] = sel[i][1]
            accel[i] = sel[i][2]
        return ImuWindow(gyro=jnp.asarray(gyro), accel=jnp.asarray(accel),
                         count=jnp.asarray(n, np.int32),
                         tsample=jnp.asarray(p.SampleTime, np.float32))

    def process_frame(self, frame, t: float,
                      imu_window: Optional[ImuWindow] = None,
                      frame_pair=None):
        """Process one frame; returns the FrameOutput (None for the
        bootstrap frame). `frame_pair` is the synchronized stereo frame
        when StereoAvaiable (the requestStereoCustomCamBuffer role,
        rebvo.h:570-585)."""
        import time as _time
        jnp = self._jnp
        p = self.params
        _tw0 = _time.perf_counter()
        frame = jnp.asarray(frame)
        if frame_pair is not None:
            frame_pair = jnp.asarray(frame_pair)
        t_prev = float(self.state.t)

        if self._reset_requested:
            # reference system_reset: reset depths + trajectory
            # (rebvo_second_t.cpp:609-620); simplest faithful form: new
            # state keeping the detector threshold.
            thresh = self.state.thresh
            self.state = self.frontend.init()._replace(thresh=thresh)
            self.frame_count = 0
            self._reset_requested = False

        if self.frame_count == 0:
            self.state = self.frontend.bootstrap(self.state, frame,
                                                 jnp.asarray(t), frame_pair)
            self.frame_count += 1
            return None

        _tw1 = _time.perf_counter()
        if p.ImuMode > 0:
            if imu_window is None:
                imu_window = self._collect_imu_window(
                    t_prev + p.TimeDesinc, t + p.TimeDesinc)
            self.state, out = self.frontend.step_imu(
                self.state, frame, jnp.asarray(t), imu_window,
                self._R_c2i, self._T_c2i, frame_pair)
        else:
            self.state, out = self.frontend.step(self.state, frame,
                                                 jnp.asarray(t), frame_pair)
        _tw2 = _time.perf_counter()
        self.frame_count += 1
        # host stage times (dtp0/dtp1/TProc2 roles): prep, step dispatch
        # (async — host cost, not device latency), previous frame's
        # output-section time (the reference also logs the previous
        # iteration's third-thread time, rebvo_third_t.cpp:303-305)
        self.logger.push(out, tproc=(_tw1 - _tw0, _tw2 - _tw1,
                                     getattr(self, "_last_tp2", 0.0)))

        with self._nav_lock:
            self._nav = out.nav
        if self._callback is not None:
            self._callback(out)

        # keyframe maintenance: the jitted step runs the online
        # TrackKeyFrames block (frontend/kf_tracking.py) and reports its
        # save decision — the reference's lost-KF-match-ratio condition
        # (rebvo_second_t.cpp:591-596); the host mirrors saved keyframes
        # into the persistent store.
        if self.kf_store is not None:
            from rebvo_tpu.backend.keyframe import push_keyframe
            from rebvo_tpu.backend.posegraph import OdometryMeas
            if self.kf_push_enabled and bool(out.kf_saved):
                self.kf_store = push_keyframe(
                    self.kf_store, self.state.klm, self.state.t,
                    self.state.K_scale, self.state.Pose, self.state.Pos,
                    self.state.Vel)
            # Information transport (rebvo_second_t.cpp:326-334): the
            # estimator's information W_X lives on x=[V;W]; the logged
            # measurement is relPose=[-R·V; log(R)]. Push W_X through the
            # pinv of J = ∂relPose/∂x so the pose-graph edge carries the
            # estimator's actual confidence, not an identity placeholder.
            R_np = np.asarray(out.nav.Rot, np.float64)
            rel_t = -R_np @ np.asarray(self.state.Vel, np.float64)
            rel = np.concatenate([rel_t, np.asarray(out.nav.RotLie,
                                                    np.float64)])
            J_rp_x = np.zeros((6, 6))
            J_rp_x[3:, 3:] = -np.eye(3)
            J_rp_x[:3, :3] = -R_np
            J_rp_x[:3, 3:] = np.array([
                [0.0, -rel_t[2], rel_t[1]],
                [rel_t[2], 0.0, -rel_t[0]],
                [-rel_t[1], rel_t[0], 0.0]])
            J_x_rp = np.linalg.pinv(J_rp_x)
            W_meas = J_x_rp.T @ np.asarray(out.W_X, np.float64) @ J_x_rp
            self.pose_log.add_frame_meas(OdometryMeas(
                rel_pose=rel,
                W=W_meas,
                g_est=np.asarray(out.nav.g, np.float64),
                K=float(out.nav.scale),
                kf_id=int(out.kf_id)))

        if self.sender is not None:
            try:
                self.sender.send(
                    self.state.klm, float(out.nav.scale),
                    np.asarray(out.nav.Pos), np.asarray(out.nav.Pose),
                    float(out.nav.t), frame=np.asarray(frame))
            except Exception:
                pass
        self._last_tp2 = _time.perf_counter() - _tw2
        return out

    # -- run helpers -----------------------------------------------------

    def run_sequence(self, seq) -> RunLogger:
        """Replay an iterable of (t, frame, imu_window|None) — or, for a
        stereo dataset, (t, frame, imu_window|None, frame_pair)."""
        for item in seq:
            if len(item) == 4:
                t, frame, win, pair = item
            else:
                t, frame, win = item
                pair = None
            self.process_frame(frame, t, win, frame_pair=pair)
        return self.logger

    def save_outputs(self, out_dir: str = ".") -> None:
        import os
        os.makedirs(out_dir, exist_ok=True)
        p = self.params
        if self.logger.rows:
            self.logger.write_trajectory(os.path.join(out_dir, p.TrayFile))
            if p.SaveLog:
                self.logger.write_mfile(os.path.join(out_dir, p.LogFile))
