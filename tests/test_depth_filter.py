import jax.numpy as jnp
import numpy as np

from rebvo_tpu.frontend.state import KeylineMap, RHO_MAX, RHO_MIN
from rebvo_tpu.kernels.depth_filter import (depth_ekf, estimate_quantile,
                                            estimate_rescaling_opt,
                                            regularize_1_iter)
from tests.ref_impl import depth_ekf_scalar

ZFM = 400.0


def simple_map(n=6, K=16):
    rng = np.random.RandomState(0)
    klm = KeylineMap.empty(K)
    rho = rng.uniform(0.2, 2.0, n)
    s_rho = rng.uniform(0.05, 0.5, n)
    ux = rng.randn(n)
    uy = rng.randn(n)
    nm = np.hypot(ux, uy)
    px = rng.uniform(-200, 200, n)
    py = rng.uniform(-150, 150, n)
    dqx = rng.uniform(-2, 2, n)
    dqy = rng.uniform(-2, 2, n)
    f = lambda a, fill=0.0: jnp.asarray(
        np.concatenate([a, np.full(K - n, fill)]), jnp.float32)
    return klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        rho=f(rho, 1.0), s_rho=f(s_rho, 20.0),
        g0x=f(ux * 50), g0y=f(uy * 50), n_m0=f(nm * 50, 1.0),
        p0x=f(px), p0y=f(py), px=f(px + dqx), py=f(py + dqy),
        m_id=jnp.asarray(np.concatenate(
            [np.arange(n), np.full(K - n, -1)]).astype(np.int32)),
    ), n


def test_depth_ekf_matches_oracle():
    klm, n = simple_map()
    vel = np.array([0.02, -0.01, 0.05])
    out = depth_ekf(klm, jnp.asarray(vel, jnp.float32), jnp.asarray(ZFM),
                    reshape_q_abs=1e-4, loc_uncertainty=1.0)
    for i in range(n):
        rho, s, rho_p = depth_ekf_scalar(
            float(klm.rho[i]), float(klm.s_rho[i]),
            float(klm.px[i]), float(klm.py[i]),
            float(klm.p0x[i]), float(klm.p0y[i]),
            float(klm.g0x[i] / klm.n_m0[i]), float(klm.g0y[i] / klm.n_m0[i]),
            vel, ZFM, 1e-4, 1.0)
        np.testing.assert_allclose(float(out.rho[i]), rho, rtol=2e-4)
        np.testing.assert_allclose(float(out.s_rho[i]), s, rtol=2e-4)
        np.testing.assert_allclose(float(out.rho0[i]), rho_p, rtol=2e-4)
    # unmatched slots untouched
    assert float(out.rho[n]) == float(klm.rho[n])


def test_depth_ekf_converges_to_truth():
    """Repeated EKF updates with consistent measurements tighten s_rho
    and converge rho to the depth explaining the observed parallax."""
    K = 8
    klm = KeylineMap.empty(K)
    rho_true = 0.8
    vel = np.array([0.05, 0.0, 0.0])
    # point at hom position q0; after translation the point moves by
    # u . (v_xy zf - v_z q0) * rho_true along u=(1,0)
    q0x, q0y = 50.0, 20.0
    dq = (vel[0] * ZFM - vel[2] * q0x) * rho_true
    klm = klm._replace(
        valid=jnp.asarray([True] + [False] * (K - 1)),
        rho=jnp.asarray([1.5] + [1.0] * (K - 1), jnp.float32),
        s_rho=jnp.asarray([10.0] + [20.0] * (K - 1), jnp.float32),
        g0x=jnp.asarray([100.0] * K, jnp.float32),
        g0y=jnp.asarray([0.0] * K, jnp.float32),
        n_m0=jnp.asarray([100.0] * K, jnp.float32),
        p0x=jnp.asarray([q0x] * K, jnp.float32),
        p0y=jnp.asarray([q0y] * K, jnp.float32),
        px=jnp.asarray([q0x + dq] * K, jnp.float32),
        py=jnp.asarray([q0y] * K, jnp.float32),
        m_id=jnp.asarray([0] + [-1] * (K - 1), jnp.int32),
    )
    for _ in range(20):
        klm = depth_ekf(klm, jnp.asarray(vel, jnp.float32), jnp.asarray(ZFM),
                        reshape_q_abs=1e-4, loc_uncertainty=0.5)
    assert abs(float(klm.rho[0]) - rho_true) < 0.05
    assert float(klm.s_rho[0]) < 0.1


def test_depth_ekf_clamps():
    K = 4
    klm = KeylineMap.empty(K)
    klm = klm._replace(
        valid=jnp.asarray([True] * K),
        rho=jnp.asarray([0.002, 19.0, 1.0, 1.0], jnp.float32),
        s_rho=jnp.asarray([0.01, 1.0, 1.0, 1.0], jnp.float32),
        g0x=jnp.ones(K, jnp.float32) * 10, g0y=jnp.zeros(K, jnp.float32),
        n_m0=jnp.ones(K, jnp.float32) * 10,
        px=jnp.asarray([-500.0, 500.0, 0.0, 0.0], jnp.float32),
        m_id=jnp.asarray([0, 1, 2, 3], jnp.int32),
    )
    out = depth_ekf(klm, jnp.asarray([0.0, 0.0, -3.0], jnp.float32),
                    jnp.asarray(ZFM), reshape_q_abs=1e-4, loc_uncertainty=1.0)
    r = np.asarray(out.rho)
    s = np.asarray(out.s_rho)
    assert np.all(r >= RHO_MIN) and np.all(r <= RHO_MAX)
    assert np.all(np.isfinite(s)) and np.all(s >= 0)


def chain_map(n=10, K=32, rho=None, s_rho=None, grads=None):
    klm = KeylineMap.empty(K)
    rho = np.ones(n) if rho is None else rho
    s_rho = np.full(n, 0.2) if s_rho is None else s_rho
    gx = np.full(n, 80.0) if grads is None else grads[0]
    gy = np.zeros(n) if grads is None else grads[1]
    nm = np.hypot(gx, gy)
    p_id = np.concatenate([[-1], np.arange(n - 1)])
    n_id = np.concatenate([np.arange(1, n), [-1]])
    f = lambda a, fill=0.0: jnp.asarray(
        np.concatenate([a, np.full(K - n, fill)]), jnp.float32)
    fi = lambda a, fill=-1: jnp.asarray(
        np.concatenate([a, np.full(K - n, fill)]).astype(np.int32))
    return klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        rho=f(rho, 1.0), s_rho=f(s_rho, 20.0),
        gx=f(gx), gy=f(gy), n_m=f(nm, 1.0),
        p_id=fi(p_id), n_id=fi(n_id))


def test_regularize_smooths_chain():
    rho = np.array([1.0, 1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    klm = chain_map(rho=rho, s_rho=np.full(10, 0.8))
    out, rnum = regularize_1_iter(klm, 0.5)
    assert int(rnum) == 8                     # endpoints skipped
    r = np.asarray(out.rho)[:10]
    assert r[2] < 2.0                         # spike pulled down
    assert r[1] > 1.0 and r[3] > 1.0          # neighbours pulled up... no:
    # neighbours of the spike blend with it only through their own
    # neighbours; index1's neighbours are 0 and 2 -> pulled up
    assert abs(np.asarray(out.rho)[0] - 1.0) < 1e-6  # endpoint untouched


def test_regularize_respects_sigma_gate():
    rho = np.array([1.0, 1.0, 5.0, 1.0, 1.0])
    # neighbours of idx2 are 1 and 3 with rho 1,1: fine. But for idx 1 and
    # 3, neighbours differ by 4 with tiny sigmas -> gated out.
    klm = chain_map(n=5, rho=rho, s_rho=np.full(5, 0.01))
    out, rnum = regularize_1_iter(klm, 0.5)
    assert float(out.rho[1]) == 1.0
    assert float(out.rho[3]) == 1.0


def test_regularize_respects_angle_gate():
    gx = np.array([80.0] * 5)
    gy = np.array([0.0, 0.0, 0.0, 0.0, 0.0])
    gx2 = gx.copy()
    # make idx2's neighbours' gradients perpendicular to each other
    gxn = np.array([80.0, 80.0, 80.0, 0.0, 80.0])
    gyn = np.array([0.0, 0.0, 0.0, 80.0, 0.0])
    klm = chain_map(n=5, rho=np.array([1, 1, 2, 1, 1.0]),
                    s_rho=np.full(5, 0.5), grads=(gxn, gyn))
    out, _ = regularize_1_iter(klm, 0.5)
    # keyline 2's neighbours are 1 (grad x) and 3 (grad y): angle fails
    assert float(out.rho[2]) == 2.0


def test_rescaling_estimates_ratio():
    K = 64
    n = 50
    rng = np.random.RandomState(3)
    rho0 = rng.uniform(0.5, 2.0, n)
    scale = 1.2
    klm = KeylineMap.empty(K)
    f = lambda a, fill=0.0: jnp.asarray(
        np.concatenate([a, np.full(K - n, fill)]), jnp.float32)
    klm = klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        rho=f(rho0 * scale, 1.0), rho0=f(rho0, 1.0),
        s_rho=f(np.full(n, 0.1), 20.0), s_rho0=f(np.full(n, 0.1), 20.0),
        m_num=jnp.asarray(np.concatenate(
            [np.full(n, 5), np.zeros(K - n)]).astype(np.int32)))
    out, Kp, RKp = estimate_rescaling_opt(klm, apply=True)
    np.testing.assert_allclose(float(Kp), scale, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.rho)[:n], rho0, rtol=1e-3)


def test_quantile_cutoff():
    K = 256
    n = 200
    rng = np.random.RandomState(1)
    s = rng.uniform(0.0, 10.0, n)
    klm = KeylineMap.empty(K)
    klm = klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        s_rho=jnp.asarray(np.concatenate(
            [s, np.full(K - n, 20.0)]), jnp.float32))
    q = float(estimate_quantile(klm, percentile=0.9, nbins=100))
    frac = (s <= q).mean()
    assert 0.88 <= frac <= 0.95
