import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import so3_exp
from rebvo_tpu.frontend.state import KeylineMap
from rebvo_tpu.kernels.depth_filler import (fill_depth, grid_points_3d,
                                            surface_normals)
from rebvo_tpu.kernels.stereo import (directed_matching_stereo,
                                      fuse_stereo_depth, stereo_depth)
from tests.synthetic import lines_scene, make_map, transform_points

ZFM = 400.0
CX, CY = 376.0, 240.0
W_IMG, H_IMG = 752, 480


def test_fill_depth_interpolates_plane():
    """Keylines on a tilted plane: relaxed grid should approximate the
    plane between the edges."""
    K = 2048
    rng = np.random.RandomState(0)
    n = 800
    x = rng.uniform(40, 700, n).astype(np.float32)
    y = rng.uniform(40, 440, n).astype(np.float32)
    # inverse depth linear in image coords (a tilted plane does this)
    rho_true = (0.3 + 0.0004 * x + 0.0002 * y).astype(np.float32)
    klm = KeylineMap.empty(K)
    pad = lambda a, fill=0.0: jnp.asarray(
        np.concatenate([a, np.full(K - n, fill, np.float32)]))
    klm = klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        x=pad(x), y=pad(y), rho=pad(rho_true, 1.0),
        s_rho=pad(np.full(n, 0.05, np.float32), 20.0))
    fill = fill_depth(klm, width=W_IMG, height=H_IMG, block=8, iters=80)
    gh, gw = fill.rho.shape
    yy, xx = np.mgrid[0:gh, 0:gw]
    expect = 0.3 + 0.0004 * (xx + 0.5) * 8 + 0.0002 * (yy + 0.5) * 8
    got = np.asarray(fill.rho)
    # interior agreement (borders extrapolate)
    err = np.abs(got[4:-4, 4:-4] - expect[4:-4, 4:-4])
    assert np.median(err) < 0.02, np.median(err)
    assert np.isfinite(got).all()

    P = np.asarray(grid_points_3d(fill, jnp.asarray(ZFM), jnp.asarray(CX),
                                  jnp.asarray(CY)))
    assert P.shape == (gh, gw, 3)
    N = np.asarray(surface_normals(fill, jnp.asarray(ZFM), jnp.asarray(CX),
                                   jnp.asarray(CY)))
    nn = np.linalg.norm(N[2:-2, 2:-2], axis=-1)
    assert np.all((nn > 0.99) & (nn < 1.01))


def _sparse_plane_map(K=2048, n=120, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.uniform(40, 700, n).astype(np.float32)
    y = rng.uniform(40, 440, n).astype(np.float32)
    rho_true = (0.3 + 0.0004 * x + 0.0002 * y).astype(np.float32)
    klm = KeylineMap.empty(K)
    pad = lambda a, fill=0.0: jnp.asarray(
        np.concatenate([a, np.full(K - n, fill, np.float32)]))
    return klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        x=pad(x), y=pad(y), rho=pad(rho_true, 1.0),
        s_rho=pad(np.full(n, 0.05, np.float32), 20.0))


def test_fill_depth_coarse_to_fine_accelerates():
    """With sparse seeds and FEW iterations, the coarse-to-fine init
    (InitCoarseFine, depth_filler.cpp:233-278) must beat the flat-mean
    init — information propagates across the grid in the pyramid, not by
    Jacobi diffusion."""
    klm = _sparse_plane_map()
    kw = dict(width=W_IMG, height=H_IMG, block=8, iters=8)
    f_c2f = fill_depth(klm, coarse_to_fine=True, **kw)
    f_flat = fill_depth(klm, coarse_to_fine=False, **kw)
    gh, gw = f_c2f.rho.shape
    yy, xx = np.mgrid[0:gh, 0:gw]
    expect = 0.3 + 0.0004 * (xx + 0.5) * 8 + 0.0002 * (yy + 0.5) * 8
    err_c2f = np.abs(np.asarray(f_c2f.rho) - expect)[4:-4, 4:-4].mean()
    err_flat = np.abs(np.asarray(f_flat.rho) - expect)[4:-4, 4:-4].mean()
    assert err_c2f < 0.7 * err_flat, (err_c2f, err_flat)


def test_fill_depth_relaxes_uncertainty():
    """s_rho is relaxed alongside rho (Integrate1Step): free cells near
    seeds inherit finite uncertainty instead of the 1e3 sentinel."""
    klm = _sparse_plane_map()
    fill = fill_depth(klm, width=W_IMG, height=H_IMG, block=8, iters=40)
    s = np.asarray(fill.s_rho)
    free = ~np.asarray(fill.fixed)
    assert np.isfinite(s).all()
    assert np.median(s[free]) < 500.0          # moved off the sentinel
    # seeded cells keep their information-weighted seed value
    assert np.median(s[np.asarray(fill.fixed)]) < 0.1


def test_fill_depth_boundary_modes():
    """BOUND_FULL pins the border cells' s_rho at the sentinel while
    BOUND_NONE relaxes it (depth_filler.h:62)."""
    klm = _sparse_plane_map()
    kw = dict(width=W_IMG, height=H_IMG, block=8, iters=40)
    f_none = fill_depth(klm, bound_mode="none", **kw)
    f_full = fill_depth(klm, bound_mode="full", **kw)
    s_none = np.asarray(f_none.s_rho)
    s_full = np.asarray(f_full.s_rho)
    border = np.zeros(s_full.shape, bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    fixed = np.asarray(f_full.fixed)
    pinned = border & ~fixed
    # full mode: non-fixed border cells keep their initial s
    assert np.median(s_full[pinned]) > np.median(s_none[pinned]), \
        (np.median(s_full[pinned]), np.median(s_none[pinned]))
    # rho itself is unaffected by the boundary mode
    np.testing.assert_allclose(np.asarray(f_none.rho),
                               np.asarray(f_full.rho), atol=1e-5)


def stereo_rig():
    R01 = np.eye(3)
    t01 = np.array([-0.11, 0.0, 0.0])    # EuRoC-like baseline
    return R01, t01


def test_stereo_depth_closed_form():
    """Project a known 3D point into both cams; closed form must recover
    its inverse depth."""
    R01, t01 = stereo_rig()
    P0 = np.array([0.4, -0.2, 2.5])
    rho_true = 1.0 / P0[2]
    p0 = P0[:2] * ZFM / P0[2]
    P1 = R01 @ P0 + t01
    p1 = P1[:2] * ZFM / P1[2]
    # edge normal along the baseline direction (x)
    rho, I = stereo_depth(
        jnp.asarray([p0[0]], jnp.float32), jnp.asarray([p0[1]], jnp.float32),
        jnp.asarray([1.0]), jnp.asarray([0.0]),
        jnp.asarray([p1[0]], jnp.float32), jnp.asarray([p1[1]], jnp.float32),
        jnp.asarray(R01, jnp.float32), jnp.asarray(t01, jnp.float32),
        jnp.asarray(ZFM), jnp.asarray(ZFM), 1.0)
    np.testing.assert_allclose(float(rho[0]), rho_true, rtol=1e-4)
    assert float(I[0]) > 0


def mask_image_for(klm, n):
    mask = np.full((H_IMG, W_IMG), -1, np.int32)
    x = np.asarray(klm.x)[:n]
    y = np.asarray(klm.y)[:n]
    for i in range(n):
        xi, yi = int(round(x[i])), int(round(y[i]))
        if 0 <= xi < W_IMG and 0 <= yi < H_IMG:
            mask[yi, xi] = i
    return jnp.asarray(mask)


def test_stereo_matching_recovers_depth():
    R01, t01 = stereo_rig()
    P, ang = lines_scene(seed=3, n_lines=8)
    n = P.shape[0]
    K = 2048
    cam0 = make_map(P, ang, ZFM, CX, CY, K, s_rho=0.4)
    P1 = transform_points(P, R01, t01)
    cam1 = make_map(P1, ang, ZFM, CX, CY, K, s_rho=0.4)
    mask1 = mask_image_for(cam1, n)

    res = directed_matching_stereo(
        cam0, cam1, mask1, jnp.asarray(t01, jnp.float32),
        jnp.asarray(R01, jnp.float32),
        zf0=jnp.asarray(ZFM), zf1=jnp.asarray(ZFM),
        cx1=jnp.asarray(CX), cy1=jnp.asarray(CY),
        width=W_IMG, height=H_IMG, max_steps=104,
        min_thr_mod=1.0, min_thr_ang=45.0, max_radius=100.0,
        loc_uncertainty=2.0)
    nm = int(res.nmatch)
    assert nm > 0.25 * n, nm   # ambiguity rejection prunes same-line hits

    m = np.asarray(res.stereo_m_id)[:n]
    rho_st = np.asarray(res.stereo_rho)[:n]
    rho_true = 1.0 / P[:, 2]
    ok = m >= 0
    rel = np.abs(rho_st[ok] - rho_true[ok]) / rho_true[ok]
    assert np.median(rel) < 0.1, np.median(rel)

    # fusion tightens uncertainty where stereo matched
    fused = fuse_stereo_depth(res.klm, res.stereo_m_id, res.stereo_rho,
                              res.stereo_s_rho)
    s_new = np.asarray(fused.s_rho)[:n]
    s_old = np.asarray(cam0.s_rho)[:n]
    assert np.all(s_new[ok] <= s_old[ok] + 1e-6)
    np.testing.assert_allclose(np.asarray(fused.rho0)[:n],
                               np.asarray(cam0.rho)[:n])
