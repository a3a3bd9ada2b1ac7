"""Tests: line fitting, compressed edgemap, kfvo, surface grid,
checkpoint/resume, profiling."""

import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import so3_exp
from rebvo_tpu.core.linefitting import (fit_line_2d, fit_segment_3d,
                                        robust_fit_segment_3d)
from rebvo_tpu.frontend.state import KeylineMap
from rebvo_tpu.runtime_utils import StageTimer, load_state, save_state
from tests.synthetic import lines_scene, make_map, transform_points

ZFM = 400.0
CX, CY = 376.0, 240.0


def test_fit_line_2d():
    t = np.linspace(0, 10, 30)
    x = 1.0 + 2.0 * t
    y = -0.5 + 1.0 * t
    cx, cy, dx, dy = fit_line_2d(x[None], y[None])
    slope = dy[0] / dx[0]
    np.testing.assert_allclose(slope, 0.5, rtol=1e-6)
    np.testing.assert_allclose(cx[0], x.mean())


def test_fit_segment_3d_recovers_line():
    t = np.linspace(0, 20, 24)
    x = 100 + 3.0 * t
    y = 50 + 1.0 * t
    rho = 0.4 + 0.01 * t
    s = np.full_like(t, 0.05)
    seg = fit_segment_3d(x[None], y[None], rho[None], s[None])
    p0, p1 = seg.p0[0], seg.p1[0]
    # endpoints near the data extremes
    np.testing.assert_allclose(sorted([p0[0], p1[0]]), [100, 160], atol=0.5)
    np.testing.assert_allclose(sorted([p0[2], p1[2]]), [0.4, 0.6], atol=0.01)
    assert seg.rms[0] < 0.1


def test_robust_fit_rejects_outlier():
    t = np.linspace(0, 20, 20)
    x = 10 + 2.0 * t
    y = 5 + 0.5 * t
    y[7] += 25.0                      # gross outlier
    rho = np.full_like(t, 0.5)
    s = np.full_like(t, 0.05)
    seg, keep = robust_fit_segment_3d(x[None], y[None], rho[None], s[None],
                                      sigma_thresh=1.0)
    assert not keep[0, 7]
    assert seg.rms[0] < 2.0


def test_compressed_edgemap_roundtrip():
    from rebvo_tpu.io.edgemap_compress import (compress_edgemap,
                                               decompress_edgemap)
    K = 256
    n = 48
    klm = KeylineMap.empty(K)
    # two chains of 24 along straight lines
    x = np.concatenate([100 + np.arange(24) * 2.0,
                        300 + np.arange(24) * 0.0])
    y = np.concatenate([50 + np.arange(24) * 1.0,
                        80 + np.arange(24) * 2.0])
    rho = np.concatenate([np.linspace(0.4, 0.6, 24),
                          np.full(24, 0.8)])
    n_id = np.concatenate([np.arange(1, 24), [-1],
                           np.arange(25, 48), [-1]]).astype(np.int32)
    p_id = np.concatenate([[-1], np.arange(23), [-1],
                           np.arange(24, 47)]).astype(np.int32)
    pad = lambda a, fill=0.0: jnp.asarray(np.concatenate(
        [a, np.full(K - n, fill)]).astype(np.float32))
    padi = lambda a: jnp.asarray(np.concatenate(
        [a, np.full(K - n, -1)]).astype(np.int32))
    klm = klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        x=pad(x), y=pad(y), rho=pad(rho, 1.0),
        s_rho=pad(np.full(n, 0.05), 20.0),
        n_id=padi(n_id), p_id=padi(p_id))

    data = compress_edgemap(klm, k_scale=1.0)
    assert len(data) < n * 16              # beats the per-keyline format
    out = decompress_edgemap(data)
    assert out is not None
    segs = out["segments"]
    assert len(segs) == 2
    # segment endpoints near the chain extremes
    ends = sorted([segs[0][0][0], segs[0][1][0]])
    np.testing.assert_allclose(ends, [100, 146], atol=1.5)


def test_kfvo_transform_and_align():
    from rebvo_tpu.backend.kfvo import (align_to_keyframe, keylines_in_fov,
                                        relative_pose, transform_map)
    from rebvo_tpu.kernels.field import build_field
    from rebvo_tpu.kernels.pose_solver import FieldView

    K = 2048
    P, ang = lines_scene(seed=2)
    n = P.shape[0]
    kf = make_map(P, ang, ZFM, CX, CY, K, s_rho=0.05)

    R_true = np.asarray(so3_exp(jnp.asarray([0.004, -0.006, 0.002],
                                            jnp.float32)), np.float64)
    t_true = np.array([0.02, -0.01, 0.03])
    Pn = transform_points(P, R_true, t_true)
    frame = make_map(Pn, ang, ZFM, CX, CY, K, s_rho=0.05)

    # transform_map must reproduce the projected geometry
    moved = transform_map(kf, jnp.asarray(R_true, jnp.float32),
                          jnp.asarray(t_true, jnp.float32),
                          jnp.asarray(ZFM))
    np.testing.assert_allclose(np.asarray(moved.px)[:n],
                               np.asarray(frame.px)[:n], atol=0.02)
    np.testing.assert_allclose(np.asarray(moved.rho)[:n],
                               np.asarray(frame.rho)[:n], rtol=1e-5)

    fov = int(keylines_in_fov(kf, jnp.asarray(R_true, jnp.float32),
                              jnp.asarray(t_true, jnp.float32),
                              jnp.asarray(ZFM), jnp.asarray(CX),
                              jnp.asarray(CY), 752, 480))
    assert fov > 0.8 * n

    # alignment from a perturbed prior recovers the true relative pose
    field = build_field(frame, jnp.asarray(0.0), radius=10, height=480,
                        width=752)
    fv = FieldView.from_map(field, frame)
    R_prior = np.asarray(so3_exp(jnp.asarray([0.003, -0.005, 0.0015],
                                             jnp.float32)), np.float64)
    t_prior = t_true + np.array([0.004, -0.002, 0.004])
    res = align_to_keyframe(
        kf, fv, jnp.asarray(R_prior, jnp.float32),
        jnp.asarray(t_prior, jnp.float32),
        zfm=jnp.asarray(ZFM), cx=jnp.asarray(CX), cy=jnp.asarray(CY),
        width=752, height=480, max_s_rho=jnp.asarray(1e3))
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=1e-3)

    # relative_pose consistency
    Pose_a = jnp.eye(3)
    Pos_a = jnp.zeros(3)
    Pose_b = jnp.asarray(R_true.T, jnp.float32)   # world-from-cam of b
    Pos_b = jnp.asarray(-R_true.T @ t_true, jnp.float32)
    R, t = relative_pose(Pose_a, Pos_a, Pose_b, Pos_b)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)


def test_ocgrid_and_raycut():
    from rebvo_tpu.backend.surface import (build_ocgrid, ray_cut_visibility,
                                           world_bounds)
    # a wall of points at z=2 and a point behind it at z=4
    wall = np.stack(np.meshgrid(np.linspace(-1, 1, 21),
                                np.linspace(-1, 1, 21)), -1).reshape(-1, 2)
    wall3 = np.concatenate([wall, np.full((wall.shape[0], 1), 2.0)], -1)
    target = np.array([[0.0, 0.0, 4.0], [3.0, 0.0, 4.0]])
    pts = jnp.asarray(np.concatenate([wall3, target]), jnp.float32)
    lo, hi = world_bounds(pts)
    grid = build_ocgrid(pts, jnp.ones(pts.shape[0], bool), lo,
                        jnp.asarray(0.25), nx=32, ny=16, nz=32)
    assert int(grid.count.sum()) == pts.shape[0]
    vis = ray_cut_visibility(grid, jnp.zeros(3), jnp.asarray(target))
    assert not bool(vis[0])       # behind the wall
    assert bool(vis[1])           # off to the side: clear


def test_checkpoint_roundtrip(tmp_path):
    from rebvo_tpu.frontend.step import VOFrontend
    from tests.test_vo_step import small_params
    fe = VOFrontend(small_params())
    st = fe.init()
    st = st._replace(Pos=jnp.asarray([1.0, 2.0, 3.0]),
                     frame_count=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ckpt.npz")
    save_state(path, st)
    st2 = load_state(path, fe.init())
    np.testing.assert_allclose(st2.Pos, [1, 2, 3])
    assert int(st2.frame_count) == 7
    # deep leaf
    np.testing.assert_allclose(np.asarray(st2.imu.X7),
                               np.asarray(st.imu.X7))


def test_stage_timer():
    import time
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    rep = t.report()
    assert 0.005 < rep["a"] < 0.1
    assert "a=" in str(t)


def test_normal_reciprocal_moments():
    """core/stats.eval_reciprocal (NormalDistribution.h:69-140): for a
    narrow Gaussian far from zero, 1/X ~ N(1/mu, dev/mu^2) to first
    order; batching broadcasts."""
    import jax.numpy as jnp
    import numpy as np

    from rebvo_tpu.core.stats import eval_reciprocal, normal_pdf

    mu, dev = 4.0, 0.2
    mr, dr = eval_reciprocal(jnp.asarray(mu), jnp.asarray(dev), n=10)
    assert abs(float(mr) - 1.0 / mu) < 0.01
    # the deviation matches dev/mu^2 up to the coarse-grid truncation
    # (the reference's r=1 grid only spans +-dev)
    assert 0.3 * dev / mu**2 < float(dr) < 2.0 * dev / mu**2

    # batched
    mus = jnp.asarray([2.0, 4.0, 8.0])
    devs = jnp.asarray([0.1, 0.2, 0.4])
    mrb, drb = eval_reciprocal(mus, devs)
    assert mrb.shape == (3,)
    np.testing.assert_allclose(np.asarray(mrb), 1.0 / np.asarray(mus),
                               rtol=0.02)

    # pdf sanity: integrates to ~1
    xs = jnp.linspace(-5, 5, 2001)
    p = normal_pdf(xs, jnp.asarray(0.0), jnp.asarray(1.0))
    assert abs(float(jnp.trapezoid(p, xs)) - 1.0) < 1e-3


def test_kfvo_optimize_scale_recovers_gauge():
    """All three optimizeScale variants (kfvo.cpp:222-330) must recover
    a known depth-gauge ratio between frame and keyframe maps."""
    import jax.numpy as jnp
    from rebvo_tpu.backend.kfvo import optimize_scale
    from tests.synthetic import lines_scene, make_map

    K = 2048
    P, ang = lines_scene(seed=5)
    n = P.shape[0]
    kf = make_map(P, ang, ZFM, CX, CY, K, s_rho=0.05)
    # frame sees the SAME points but its depth gauge is 1.25x off:
    # rho_frame = rho_true * 1.25 (depths look 1.25x closer)
    gauge = 1.25
    fr = make_map(P, ang, ZFM, CX, CY, K, s_rho=0.05)
    fr = fr._replace(rho=fr.rho * gauge)
    m_id = jnp.asarray(np.where(np.arange(K) < n, np.arange(K), -1),
                       jnp.int32)
    R = jnp.eye(3)
    t = jnp.zeros(3)

    # fwd: Kr = sum(q1z^2/v)/sum(q1z rho_b/v); with q1z = rho_true*gauge
    # and rho_b = rho_true the ratio is exactly the gauge
    Kr, w = optimize_scale(fr, kf, m_id, R, t, jnp.asarray(ZFM), mode="fwd")
    np.testing.assert_allclose(float(Kr), gauge, rtol=1e-3)
    assert float(w) > 0

    # f2kf: Kr = sum(rho_b^2/v)/sum(q1z^2/v) = 1/gauge^2 exactly here
    Kr2, W_Kp = optimize_scale(fr, kf, m_id, R, t, jnp.asarray(ZFM),
                               mode="f2kf")
    np.testing.assert_allclose(float(Kr2), 1.0 / gauge ** 2, rtol=1e-3)
    assert float(W_Kp) > 0

    # back: Kr = sum(q1z rho_b/v)/sum(q1z^2/v) = 1/gauge
    Kr3, _ = optimize_scale(fr, kf, m_id, R, t, jnp.asarray(ZFM),
                            mode="back", init=1.0)
    np.testing.assert_allclose(float(Kr3), 1.0 / gauge, rtol=1e-3)

    # no matches -> the reference's fallback guards
    none = jnp.full((K,), -1, jnp.int32)
    Kr4, w4 = optimize_scale(fr, kf, none, R, t, jnp.asarray(ZFM),
                             mode="back", init=3.7)
    assert float(w4) == 0
    np.testing.assert_allclose(float(Kr4), 3.7, rtol=1e-6)


def test_kfvo_mutual_exclusion():
    """Round-trip filter (mutualExclusionSimple, kfvo.cpp:423-525):
    non-mutual and far round trips are cleared, consistent ones kept."""
    import jax.numpy as jnp
    from rebvo_tpu.backend.kfvo import mutual_exclusion

    # 4 keylines: 0 mutual-consistent, 1 non-mutual, 2 far round trip,
    # 3 unmatched
    m_fwd = jnp.asarray([10, 11, 12, -1], jnp.int32)
    valid = jnp.ones((4,), bool)
    # partner map back matches (by partner index): 10->0, 11->none,
    # 12->0 (round trip of kl 2 lands on kl 0, far away)
    m_back = jnp.full((16,), -1, jnp.int32)
    m_back = m_back.at[10].set(0).at[12].set(0)
    px = jnp.asarray([0.0, 50.0, 100.0, 150.0], jnp.float32)
    py = jnp.zeros((4,), jnp.float32)
    ux = jnp.ones((4,), jnp.float32)
    uy = jnp.zeros((4,), jnp.float32)

    out, total, mutual = mutual_exclusion(
        m_fwd, valid, m_back, px, py, ux, uy, dist_thresh=5.0)
    assert out.tolist() == [10, -1, -1, -1]
    assert int(total) == 3 and int(mutual) == 1

    # keep non-mutual matches when discard_non_mutual=False
    out2, _, _ = mutual_exclusion(
        m_fwd, valid, m_back, px, py, ux, uy, dist_thresh=5.0,
        discard_non_mutual=False)
    assert out2.tolist() == [10, 11, -1, -1]

    # normal-projected distance (the reference's second branch): a far
    # round trip PERPENDICULAR to the normal is tolerated
    py_perp = jnp.asarray([0.0, 0.0, 100.0, 0.0], jnp.float32)
    px_same = jnp.asarray([0.0, 50.0, 0.0, 150.0], jnp.float32)
    out3, _, _ = mutual_exclusion(
        m_fwd, valid, m_back, px_same, py_perp, ux, uy, dist_thresh=5.0,
        along_normal=True)
    assert int(out3[2]) == 12     # dy=100 but normal is x: kept
