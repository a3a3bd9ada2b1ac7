"""End-to-end visual-inertial step test on a rendered sequence with
synthetic IMU (BASELINE.json config 3 shape: CSV-IMU visual-inertial)."""

import jax.numpy as jnp
import numpy as np

from rebvo_tpu.frontend.imu import ImuWindow
from rebvo_tpu.frontend.step import VOFrontend
from tests.render import render_billboards_seq
from tests.test_vo_step import SMALL, small_params


def make_vi_sequence(n=36, fps=20.0, imu_hz=200.0, seed=0):
    """Camera oscillating along x over the billboard scene; level camera;
    gravity +y (down) in the camera frame. Returns frames, times, windows."""
    A = 0.18
    om = 2 * np.pi * 0.5
    t_frames = np.arange(n) / fps
    x = A * np.sin(om * t_frames)
    pos = np.zeros((n, 3))
    pos[:, 0] = x
    kw = {k: v for k, v in SMALL.items() if k != "z0"}
    frames, depths = render_billboards_seq(n, cam_positions=pos,
                                           return_depth=True, seed=seed,
                                           **kw)
    ts = 1.0 / imu_hz
    spf = int(round(imu_hz / fps))
    S = spf + 6
    wins = []
    for i in range(n):
        t0 = (i - 1) / fps
        tt = t0 + (np.arange(spf) + 1) * ts
        a_x = -A * om * om * np.sin(om * tt)
        accel = np.zeros((S, 3), np.float32)
        accel[:spf, 0] = a_x
        accel[:spf, 1] = -9.8           # reaction to gravity (+y down)
        gyro = np.zeros((S, 3), np.float32)
        wins.append(ImuWindow(gyro=jnp.asarray(gyro),
                              accel=jnp.asarray(accel),
                              count=jnp.asarray(spf, jnp.int32),
                              tsample=jnp.asarray(ts, jnp.float32)))
    return frames, t_frames, wins, pos, depths


def test_vi_pipeline_runs_and_aligns_gravity():
    frames, t_frames, wins, pos_true, depths = make_vi_sequence()
    p = small_params().replace(ImuMode=2, InitBiasFrameNum=4)
    fe = VOFrontend(p)
    st = fe.init()
    st = fe.bootstrap(st, jnp.asarray(frames[0]), jnp.asarray(t_frames[0]))
    navs = []
    for i in range(1, frames.shape[0]):
        st, out = fe.step_imu(st, jnp.asarray(frames[i]),
                              jnp.asarray(t_frames[i]), wins[i])
        navs.append(out)

    # everything stays finite and matching healthy
    P = np.stack([np.asarray(o.nav.Pos) for o in navs])
    assert np.all(np.isfinite(P))
    oks = [bool(o.nav.estimation_ok) for o in navs]
    assert np.mean(oks[3:]) > 0.9, oks

    # gyro bias init converged to ~0 (zero-gyro input)
    assert np.abs(np.asarray(st.imu.Bg)).max() < 1e-3

    # gravity estimate aligned with +y (down) in the camera frame
    g = np.asarray(st.imu.g_est)
    gn = g / np.linalg.norm(g)
    assert gn[1] > 0.95, g
    assert abs(np.linalg.norm(g) - 9.8) < 0.5, g

    # the gravity-aligned pose keeps the world y axis near the camera y
    Pose = np.asarray(navs[-1].nav.Pose)
    np.testing.assert_allclose(Pose @ gn, [0, 1, 0], atol=0.1)

    # trajectory oscillates dominantly along world-x
    span = P.max(0) - P.min(0)
    assert span[0] > 2.0 * span[2], (span, P[-5:])

    # scale state stays positive and finite
    assert 0.0 < float(st.K_scale) < 100.0


def make_vi_rot_sequence(n=40, fps=20.0, imu_hz=200.0, seed=0,
                         R_c2i=None):
    """Simultaneous translation (x sinusoid) + yaw rotation (about the
    camera y axis) + gravity: the full-pose VI oracle scene. IMU samples
    are physical body rates / specific force; with `R_c2i` given they
    are expressed in a rotated IMU mounting frame (x_imu = R_c2i x_cam),
    exercising the CamImuSE3 path (imugrabber.cpp:135-160,217-250)."""
    A = 0.15
    om = 2 * np.pi * 0.5
    Ar = 0.06                       # yaw amplitude (rad)
    t_hold = 0.35                   # stationary start: the gyro-bias
                                    # init averages the first frames as
                                    # bias (rebvo_second_t.cpp:163-185)
    t_frames = np.arange(n) / fps

    def phase(t):
        return np.maximum(t - t_hold, 0.0)

    x = A * np.sin(om * phase(t_frames))
    yaw = Ar * np.sin(om * phase(t_frames))
    pos = np.zeros((n, 3))
    pos[:, 0] = x

    def yaw_R(a):
        c, s = np.cos(a), np.sin(a)
        return np.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])

    rots = np.stack([yaw_R(a) for a in yaw])
    kw = {k: v for k, v in SMALL.items() if k != "z0"}
    frames = render_billboards_seq(n, cam_positions=pos,
                                   cam_rotations=rots, seed=seed, **kw)

    ts = 1.0 / imu_hz
    spf = int(round(imu_hz / fps))
    S = spf + 6
    g_w = np.asarray([0.0, 9.8, 0.0])
    R_m = np.eye(3) if R_c2i is None else np.asarray(R_c2i)
    wins = []
    for i in range(n):
        t0 = (i - 1) / fps
        tt = t0 + (np.arange(spf) + 1) * ts
        moving = (tt > t_hold).astype(np.float64)
        ph = om * phase(tt)
        a_w = np.zeros((spf, 3))
        a_w[:, 0] = -A * om * om * np.sin(ph) * moving  # world acceleration
        yaw_t = Ar * np.sin(ph)
        yaw_dot = Ar * om * np.cos(ph) * moving
        gyro = np.zeros((S, 3), np.float32)
        accel = np.zeros((S, 3), np.float32)
        for k in range(spf):
            Rwc = yaw_R(yaw_t[k])
            f_cam = Rwc.T @ (a_w[k] - g_w)             # specific force
            w_cam = np.asarray([0.0, yaw_dot[k], 0.0])  # body rate
            gyro[k] = R_m @ w_cam
            accel[k] = R_m @ f_cam
        wins.append(ImuWindow(gyro=jnp.asarray(gyro),
                              accel=jnp.asarray(accel),
                              count=jnp.asarray(spf, jnp.int32),
                              tsample=jnp.asarray(ts, jnp.float32)))
    return frames, t_frames, wins, pos, yaw


def _run_vi(frames, t_frames, wins, params, R_c2i=None, T_c2i=None):
    fe = VOFrontend(params)
    st = fe.init()
    st = fe.bootstrap(st, jnp.asarray(frames[0]), jnp.asarray(t_frames[0]))
    navs = []
    Rj = None if R_c2i is None else jnp.asarray(R_c2i, jnp.float32)
    Tj = None if T_c2i is None else jnp.asarray(T_c2i, jnp.float32)
    for i in range(1, frames.shape[0]):
        st, out = fe.step_imu(st, jnp.asarray(frames[i]),
                              jnp.asarray(t_frames[i]), wins[i], Rj, Tj)
        navs.append(out)
    return st, navs


def test_vi_full_pose_ate():
    """The VI analogue of test_vo_step's ATE gate: rotation + translation
    + gravity recovered simultaneously, trajectory gated on similarity-
    aligned ATE (weak #4 of the round-1 review)."""
    from rebvo_tpu.io.trajectory import ate_rmse
    frames, t_frames, wins, pos_true, yaw_true = make_vi_rot_sequence()
    p = small_params().replace(ImuMode=2, InitBiasFrameNum=4)
    st, navs = _run_vi(frames, t_frames, wins, p)

    oks = [bool(o.nav.estimation_ok) for o in navs]
    assert np.mean(oks[3:]) > 0.9, oks
    P = np.stack([np.asarray(o.nav.Pos) for o in navs])
    assert np.all(np.isfinite(P))

    # gravity recovered while rotating
    g = np.asarray(st.imu.g_est)
    gn = g / np.linalg.norm(g)
    assert gn[1] > 0.9, g

    # per-frame backward rotation tracks the yaw rate: nav.Rot is the
    # backward (new->old) rotation, so its Lie-y component integrates
    # the forward camera yaw directly
    dyaw = np.stack([np.asarray(o.nav.RotLie) for o in navs])[:, 1]
    yaw_est = np.cumsum(dyaw)
    yaw_ref = yaw_true[1:] - yaw_true[0]
    assert np.max(np.abs(yaw_est - yaw_ref)) < 0.03, \
        np.max(np.abs(yaw_est - yaw_ref))

    # similarity-aligned ATE against the true trajectory
    ate = ate_rmse(P[4:], pos_true[5:], with_scale=True)
    span = pos_true[:, 0].max() - pos_true[:, 0].min()
    assert ate < 0.15 * span, (ate, span)


def test_vi_cam_imu_extrinsics():
    """The same sequence with the IMU mounted rotated 90deg about z:
    passing R_cam2imu must recover the same health and trajectory shape
    (the reference loads this from CamImuSE3File)."""
    from rebvo_tpu.io.trajectory import ate_rmse
    Rz = np.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    frames, t_frames, wins, pos_true, _ = make_vi_rot_sequence(R_c2i=Rz)
    p = small_params().replace(ImuMode=2, InitBiasFrameNum=4)
    st, navs = _run_vi(frames, t_frames, wins, p, R_c2i=Rz,
                       T_c2i=np.zeros(3))

    oks = [bool(o.nav.estimation_ok) for o in navs]
    assert np.mean(oks[3:]) > 0.9, oks
    g = np.asarray(st.imu.g_est)
    assert g[1] / np.linalg.norm(g) > 0.9, g
    P = np.stack([np.asarray(o.nav.Pos) for o in navs])
    ate = ate_rmse(P[4:], pos_true[5:], with_scale=True)
    span = pos_true[:, 0].max() - pos_true[:, 0].min()
    assert ate < 0.15 * span, (ate, span)


def test_vi_scale_filter_moves_toward_gauge():
    """With a responsive QKp the scale estimate must move toward the
    visual/metric gauge ratio (rho_est ~ gauge * rho_true)."""
    frames, t_frames, wins, pos_true, depths = make_vi_sequence(n=40)
    p = small_params().replace(ImuMode=2, InitBiasFrameNum=4,
                               ScaleStdDevInit=0.2)
    fe = VOFrontend(p)
    st = fe.init()
    # make the scale process noise responsive for the test
    st = st._replace(P_Kp=jnp.asarray(2e-2, jnp.float32))
    st = fe.bootstrap(st, jnp.asarray(frames[0]), jnp.asarray(t_frames[0]))
    Ks = []
    for i in range(1, frames.shape[0]):
        st = st._replace(P_Kp=jnp.maximum(st.P_Kp, 2e-2))
        st, out = fe.step_imu(st, jnp.asarray(frames[i]),
                              jnp.asarray(t_frames[i]), wins[i])
        Ks.append(float(st.K_scale))

    # measure the actual visual gauge of the final map
    klm = st.klm
    val = np.asarray(klm.valid)
    sr = np.asarray(klm.s_rho)
    conf = val & (sr < 0.5)
    x = np.asarray(klm.x)[conf].round().astype(int).clip(0, SMALL["width"] - 1)
    y = np.asarray(klm.y)[conf].round().astype(int).clip(0, SMALL["height"] - 1)
    gauge = np.median(np.asarray(klm.rho)[conf] * depths[-1][y, x])

    K_final = Ks[-1]
    assert np.isfinite(K_final) and K_final > 0
    # K should have moved from 1 toward the gauge (loose factor-2 band:
    # 40 frames of a drift-tracking filter)
    if gauge > 1.5:
        assert K_final > 1.2, (K_final, gauge)
        assert K_final < gauge * 2.5, (K_final, gauge)


def make_vi_sequence_static_start(n=24, fps=20.0, imu_hz=200.0, seed=0,
                                  hold=6, A=0.18, f_hz=0.5):
    """Like make_vi_sequence but physically consistent with the
    reference's static bias initialisation (InitBias=1 averages the
    first InitBiasFrameNum frames ASSUMING a static rig,
    rebvo_second_t.cpp:131-141): the rig holds still for `hold` frames,
    then runs one smooth 1-cos excursion along x. Returns
    (frames, t_frames, wins, pos, depths)."""
    om = 2 * np.pi * f_hz
    t_frames = np.arange(n) / fps
    th = hold / fps

    def x_of(t):
        t = np.asarray(t)
        return np.where(t < th, 0.0, 0.5 * A * (1 - np.cos(om * (t - th))))

    def a_of(t):
        t = np.asarray(t)
        return np.where(t < th, 0.0, 0.5 * A * om * om * np.cos(om * (t - th)))

    pos = np.zeros((n, 3))
    pos[:, 0] = x_of(t_frames)
    kw = {k: v for k, v in SMALL.items() if k != "z0"}
    frames, depths = render_billboards_seq(n, cam_positions=pos,
                                           return_depth=True, seed=seed,
                                           **kw)
    ts = 1.0 / imu_hz
    spf = int(round(imu_hz / fps))
    S = spf + 6
    wins = []
    for i in range(n):
        t0 = (i - 1) / fps
        tt = t0 + (np.arange(spf) + 1) * ts
        accel = np.zeros((S, 3), np.float32)
        accel[:spf, 0] = a_of(tt)
        accel[:spf, 1] = -9.8
        gyro = np.zeros((S, 3), np.float32)
        wins.append(ImuWindow(gyro=jnp.asarray(gyro),
                              accel=jnp.asarray(accel),
                              count=jnp.asarray(spf, jnp.int32),
                              tsample=jnp.asarray(ts, jnp.float32)))
    return frames, t_frames, wins, pos, depths
