import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import so3_exp, so3_log
from rebvo_tpu.frontend.imu import (ImuWindow, ScaleWindows, bias_correct,
                                    est_acel_lsq4, est_ka_gmek_bias,
                                    ext_rot_vel, integrate_window,
                                    mean_acel4, rotation_between)
from rebvo_tpu.frontend.state import KeylineMap


def test_integrate_window_matches_naive():
    rng = np.random.RandomState(0)
    S = 16
    n = 11
    ts = 0.005
    gyro = rng.randn(S, 3).astype(np.float32) * 0.2
    accel = rng.randn(S, 3).astype(np.float32)
    win = ImuWindow(gyro=jnp.asarray(gyro), accel=jnp.asarray(accel),
                    count=jnp.asarray(n, jnp.int32),
                    tsample=jnp.asarray(ts, jnp.float32))
    Rci = np.asarray(so3_exp(jnp.asarray([0.1, -0.2, 0.05], jnp.float32)))
    Tci = np.array([0.01, -0.02, 0.03], np.float32)
    out = integrate_window(win, jnp.asarray(Rci), jnp.asarray(Tci))

    g_c = gyro[:n] @ Rci            # R^T @ g  == g @ R
    a_c = accel[:n] @ Rci
    np.testing.assert_allclose(out.giro, g_c.mean(0), rtol=1e-5)
    np.testing.assert_allclose(out.acel, a_c.mean(0), rtol=1e-5)
    R = np.eye(3)
    for i in range(n):
        w = g_c[i] * ts
        R = R @ np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
    np.testing.assert_allclose(out.Rot, R, atol=1e-5)
    dg = (g_c[n - 1] - g_c[0]) / (n * ts)
    np.testing.assert_allclose(out.dgiro, dg, rtol=1e-4, atol=1e-6)
    cacel = a_c.mean(0) + np.cross(dg, -(Rci.T @ Tci))
    np.testing.assert_allclose(out.cacel, cacel, rtol=1e-4, atol=1e-6)
    assert abs(float(out.dt) - n * ts) < 1e-7


def _matched_map(V_true, W_true, zfm=400.0, n=600, seed=0, s_rho=0.05):
    """KeylineMap whose (p_m_0 -> p_m) displacements follow a known
    rototranslation, for exercising ExtRotVel."""
    rng = np.random.RandomState(seed)
    K = 1024
    q0x = rng.uniform(-250, 250, n)
    q0y = rng.uniform(-180, 180, n)
    rho = rng.uniform(0.2, 1.0, n)
    ang = rng.uniform(0, 2 * np.pi, n)
    ux, uy = np.cos(ang), np.sin(ang)
    # ground-truth displacement: linearised model used by ExtRotVel
    R = np.asarray(so3_exp(jnp.asarray(W_true, jnp.float32)), np.float64)
    X = q0x / zfm / rho
    Y = q0y / zfm / rho
    Z = 1.0 / rho
    P = np.stack([X, Y, Z], -1) @ R.T + V_true
    qx = P[:, 0] * zfm / P[:, 2]
    qy = P[:, 1] * zfm / P[:, 2]

    f = lambda a, fill=0.0: jnp.asarray(
        np.concatenate([a, np.full(K - n, fill)]), jnp.float32)
    klm = KeylineMap.empty(K)
    return klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        px=f(qx), py=f(qy), p0x=f(q0x), p0y=f(q0y),
        ux=f(ux), uy=f(uy),
        rho=f(rho, 1.0), s_rho=f(np.full(n, s_rho), 20.0),
        m_id=jnp.asarray(np.concatenate(
            [np.arange(n), np.full(K - n, -1)]).astype(np.int32)))


def test_ext_rot_vel_recovers_increment():
    """With vel = the true translation, the 6-dof increment should be ~0;
    with vel off by dV, the correction recovers dV."""
    V_true = np.array([0.01, -0.005, 0.02])
    W_true = np.zeros(3)
    klm = _matched_map(V_true, W_true)
    ok, Wx, Rx, X = ext_rot_vel(klm, jnp.asarray(V_true, jnp.float32),
                                jnp.asarray(400.0), 1.0, 2.0)
    assert bool(ok)
    assert np.abs(np.asarray(X)).max() < 1e-3, X

    # now lie about the translation: the increment picks up the miss
    V_wrong = V_true - np.array([0.004, 0.0, 0.0])
    ok, Wx, Rx, X = ext_rot_vel(klm, jnp.asarray(V_wrong, jnp.float32),
                                jnp.asarray(400.0), 1.0, 2.0)
    X = np.asarray(X)
    np.testing.assert_allclose(X[:3], [0.004, 0, 0], atol=8e-4)


def test_ext_rot_vel_recovers_rotation():
    V_true = np.zeros(3)
    W_true = np.array([0.002, -0.003, 0.004])
    klm = _matched_map(V_true, W_true)
    ok, Wx, Rx, X = ext_rot_vel(klm, jnp.zeros(3, jnp.float32),
                                jnp.asarray(400.0), 1.0, 2.0)
    X = np.asarray(X)
    np.testing.assert_allclose(X[3:], W_true, atol=5e-4)


def test_bias_correct_pulls_toward_gyro():
    """Visual rotation fused with the (zero, by pre-rotation) gyro
    measurement. The gyro's effective information is limited by the bias
    information (Wg(I - (Wg+Wb)^-1 Wg) ~ Wb for Wg >> Wb): with both
    strong, the residual rotation shrinks; with a weak gyro it is kept."""
    X = jnp.asarray([0.01, 0, 0, 0.01, 0.005, -0.002], jnp.float32)
    Wx = jnp.eye(6) * 1e4
    Gb = jnp.zeros(3)
    Rb = jnp.eye(3) * 1e-12

    strong = jnp.eye(3) * 1e-9     # tiny gyro covariance = strong info
    Wb_strong = jnp.eye(3) * 1e7   # well-known bias
    Xs, _, Gbs, _ = bias_correct(X, Wx, Gb, Wb_strong, strong, Rb)
    assert np.abs(np.asarray(Xs)[3:]).max() < \
        np.abs(np.asarray(X)[3:]).max() * 0.1
    # translation untouched
    np.testing.assert_allclose(np.asarray(Xs)[:3], np.asarray(X)[:3],
                               rtol=1e-4)

    weak = jnp.eye(3) * 1e8
    Xw, _, _, _ = bias_correct(X, Wx, Gb, jnp.eye(3) * 1e2, weak, Rb)
    np.testing.assert_allclose(np.asarray(Xw)[3:], np.asarray(X)[3:],
                               rtol=0.05, atol=1e-4)


def test_acel_windows_constant_acceleration():
    """Velocity ramp -> LS slope equals the acceleration."""
    win = ScaleWindows.init()
    a_true = np.array([0.3, -0.1, 0.2])
    dt = 0.05
    R = jnp.eye(3)
    for i in range(8):
        v = a_true * (i * dt)
        win, acel = est_acel_lsq4(win, jnp.asarray(v, jnp.float32), R,
                                  jnp.asarray(dt, jnp.float32))
    np.testing.assert_allclose(acel, a_true, rtol=1e-3, atol=1e-4)

    win2 = ScaleWindows.init()
    for i in range(6):
        win2, mean_a = mean_acel4(win2, jnp.asarray([1.0, 2.0, 3.0],
                                                    jnp.float32), R)
    np.testing.assert_allclose(mean_a, [1, 2, 3], rtol=1e-5)


def test_est_ka_gmek_bias_converges_scale():
    """Feed consistent accelerations: a_s = k*a_v - g. The filter's
    tan(alpha) must converge to k and g_est to g."""
    k_true = 2.5
    g_vec = np.array([0.3, 9.79, 0.2])
    g_vec = g_vec / np.linalg.norm(g_vec) * 9.8
    dt = jnp.float32
    X = jnp.asarray([np.pi / 4, 0, 9.8, 0, 0, 0, 0], dt)
    P = jnp.diag(jnp.asarray([1.2e-3 ** 2, 100, 100, 100,
                              1e-13, 1e-13, 1e-13], dt))
    eye3 = jnp.eye(3, dtype=dt)
    rng = np.random.RandomState(0)
    K = None
    for i in range(30):
        a_v = rng.randn(3) * 0.4                  # visual acceleration
        a_s = k_true * a_v - g_vec                # accelerometer reading
        Kf, X, P, g_est, b_est, Xc = est_ka_gmek_bias(
            jnp.asarray(a_s, dt), jnp.asarray(a_v, dt),
            jnp.asarray(1.0, dt), eye3, X, P,
            # QKp is raised far above the production tuning so the scale
            # state can traverse from tan(pi/4)=1 to k_true within a few
            # dozen iterations — this verifies the filter equations, not
            # the (deliberately slow) EuRoC drift-tracking tuning.
            Qg=eye3 * 2e-3 ** 2, Qrot=eye3 * 1e-8,
            Qbias=eye3 * 1e-7 ** 2, QKp=jnp.asarray(3e-2, dt),
            Rg=jnp.asarray(0.2e3 ** 2, dt), Rs=eye3 * 2e-3 ** 2,
            Rv=eye3 * 1e-4, Wvw=jnp.eye(6) * 1e4,
            Xvw=jnp.zeros(6), g_gravit=9.8)
        K = float(Kf)
    assert abs(K - k_true) / k_true < 0.05, K
    np.testing.assert_allclose(np.asarray(g_est), g_vec, rtol=0.05,
                               atol=0.15)


def test_scale_filter_no_variance_attractor():
    """Regression for the round-4 VI parity bug: Rv is in visual-gauge
    units while Rs is metric, and without the NLL's 1/2 log|Pz(a)| term
    the cost 1/2 F^T W(a) F rewards inflating the modelled variance —
    with Rv >> Rs (large monocular gauge) alpha -> pi/2 and K exploded
    past 100 on real scenes. With the log-det term, K stays bounded and
    gravity stays on-module even with lagged, noisy visual accel."""
    from rebvo_tpu.frontend.imu import est_ka_gmek_bias
    dt_t = jnp.float32
    eye3 = jnp.eye(3, dtype=dt_t)
    X = jnp.asarray([np.pi / 4, 0.0, 9.8, 0.0, 0.0, 0.0, 0.0], dt_t)
    P = jnp.diag(jnp.asarray([1.44e-6, 100, 100, 100, 1e-13, 1e-13,
                              1e-13], dt_t))
    rng = np.random.RandomState(3)
    k_true = 2.4
    dt_f = 0.05
    rv = 1e-5 / dt_f ** 4            # visual-gauge noise >> Rs = 4e-6
    Ks = []
    for frame in range(80):
        t = frame * dt_f
        act = min(t / 1.0, 1.0)
        aw = 3.3 * np.sin(2 * np.pi * 1.3 * t) * act
        a_s = jnp.asarray([aw, -9.8, 0.0], dt_t)
        tl = max(t - 2 * dt_f, 0.0)  # visual accel lags 2 frames
        av = (3.3 * np.sin(2 * np.pi * 1.3 * tl) *
              min(tl / 1.0, 1.0) / k_true)
        a_v = (jnp.asarray([av, 0.0, 0.0], dt_t) +
               jnp.asarray(rng.randn(3), dt_t) * np.sqrt(1e-5) / dt_f ** 2)
        K, X, P, g_est, b_est, _ = est_ka_gmek_bias(
            a_s, a_v, jnp.asarray(1.0, dt_t), eye3, X, P,
            Qg=eye3 * 2e-3 ** 2, Qrot=eye3 * 1e-8,
            Qbias=eye3 * 1e-7 ** 2,
            QKp=jnp.asarray(5e-2 if frame < 10 else 1e-5, dt_t),
            Rg=jnp.asarray(0.2e3 ** 2, dt_t), Rs=eye3 * 2e-3 ** 2,
            Rv=eye3 * rv, Wvw=jnp.eye(6) * 1e6,
            Xvw=jnp.zeros(6), g_gravit=9.8, nll_logdet=True)
        Ks.append(float(K))
    # bounded (no pi/2 attractor), in the right decade, gravity on-module
    assert max(Ks) < 15.0, max(Ks)
    assert 0.5 < Ks[-1] < 6.0, Ks[-1]
    g = np.asarray(g_est)
    assert abs(np.linalg.norm(g) - 9.8) < 0.5, g
    assert g[1] > 9.0, g


def test_rotation_between():
    a = jnp.asarray([0.3, 9.7, 0.5])
    b = jnp.asarray([0.0, 1.0, 0.0])
    R = rotation_between(a, b)
    out = np.asarray(R) @ (np.asarray(a) / np.linalg.norm(np.asarray(a)))
    np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)
    # orthonormal
    np.testing.assert_allclose(np.asarray(R) @ np.asarray(R).T, np.eye(3),
                               atol=1e-6)
