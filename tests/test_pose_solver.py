import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import so3_exp
from rebvo_tpu.frontend.state import KeylineMap
from rebvo_tpu.kernels.field import build_field
from rebvo_tpu.kernels.pose_solver import (FieldView, minimizer_rv,
                                           try_vel_rot)
from tests.synthetic import lines_scene, make_map, transform_points

ZFM = 400.0
CX, CY = 376.0, 240.0
W_IMG, H_IMG = 752, 480
K = 2048


def build_scene(V_true, W_true, seed=0):
    P, ang = lines_scene(seed=seed)
    old = make_map(P, ang, ZFM, CX, CY, K)
    R = np.asarray(so3_exp(jnp.asarray(W_true, jnp.float32)), np.float64)
    Pn = transform_points(P, R, np.asarray(V_true))
    # gradients rotate with the z-rotation of the motion
    new = make_map(Pn, ang + W_true[2], ZFM, CX, CY, K)
    field = build_field(new, jnp.asarray(0.0), radius=10, height=H_IMG,
                        width=W_IMG)
    return old, new, FieldView.from_map(field, new)


def common_kwargs():
    return dict(zfm=jnp.asarray(ZFM), cx=jnp.asarray(CX), cy=jnp.asarray(CY),
                width=W_IMG, height=H_IMG, max_r=jnp.asarray(10.0),
                match_thresh=0.5, max_s_rho=jnp.asarray(1e3),
                match_num_min=jnp.asarray(0, jnp.int32), k_huber=2.0)


def test_field_paints_segments():
    P, ang = lines_scene(n_lines=1, pts_per_line=5, seed=1)
    klm = make_map(P, ang, ZFM, CX, CY, 64)
    field = np.asarray(build_field(klm, jnp.asarray(0.0), radius=4,
                                   height=H_IMG, width=W_IMG))
    ids = np.unique(field[field >= 0])
    assert len(ids) >= 4              # most keylines paint something
    # the painted pixels near each keyline resolve to that keyline
    x = np.asarray(klm.x)[:5]
    y = np.asarray(klm.y)[:5]
    for i in range(5):
        assert field[int(round(y[i])), int(round(x[i]))] >= 0


def test_tryvelrot_zero_residual_at_truth():
    V_true = np.array([0.05, -0.03, 0.08])
    W_true = np.array([0.01, -0.02, 0.005])
    old, new, fv = build_scene(V_true, W_true)
    X = jnp.asarray(np.concatenate([V_true, W_true]), jnp.float32)
    r = try_vel_rot(X, old, fv, **common_kwargs())
    n_match = int(jnp.sum(r.m_id_f >= 0))
    n_old = int(jnp.sum(old.valid))
    assert n_match > 0.9 * n_old
    # at the true state residuals of matched keylines are ~0 (a few
    # keylines legitimately match crossing lines in the field, so check
    # the 95th percentile, not the max)
    res = np.asarray(r.residual)[np.asarray(r.m_id_f) >= 0]
    assert np.percentile(np.abs(res), 95) < 0.05
    assert np.median(np.abs(res)) < 1e-3


def test_tryvelrot_jacobian_vs_autodiff():
    """JtF must equal the gradient of 0.5*score wrt X.

    Like the reference, the GN Jacobian treats the state-dependent noise
    q_rho as constant — so to isolate the geometric Jacobian the scene
    uses s_rho ~ 0 (q_rho == 1). The rotation block uses the reference's
    left-perturbation model, exact only at W=0, so it gets a looser
    tolerance at this small W.
    """
    import jax
    from rebvo_tpu.kernels.field import build_field
    V_true = np.array([0.02, -0.01, 0.04])
    W_true = np.array([0.004, -0.006, 0.003])
    P, ang = lines_scene(seed=0)
    old = make_map(P, ang, ZFM, CX, CY, K, s_rho=1e-6)
    R = np.asarray(so3_exp(jnp.asarray(W_true, jnp.float32)), np.float64)
    Pn = transform_points(P, R, V_true)
    new = make_map(Pn, ang + W_true[2], ZFM, CX, CY, K, s_rho=1e-6)
    field = build_field(new, jnp.asarray(0.0), radius=10, height=H_IMG,
                        width=W_IMG)
    fv = FieldView.from_map(field, new)
    kw = common_kwargs()
    X0 = jnp.asarray(np.concatenate([V_true, W_true]) * 0.9, jnp.float32)

    def half_score(X):
        r = try_vel_rot(X, old, fv, **kw)
        return 0.5 * r.score

    g_auto = jax.grad(half_score)(X0)
    r = try_vel_rot(X0, old, fv, **kw)
    ga = np.asarray(g_auto, np.float64)
    jf = np.asarray(r.JtF, np.float64)
    scale = np.abs(ga).max()
    np.testing.assert_allclose(jf[:3], ga[:3], rtol=1e-3, atol=scale * 1e-3)
    np.testing.assert_allclose(jf[3:], ga[3:], rtol=0.05, atol=scale * 0.02)


def test_minimizer_recovers_motion():
    # Moderate inter-frame motion (a few pixels of displacement): within
    # the zero-init basin of attraction, as in real frame-to-frame VO.
    # (Larger motions need the warm-start prior — covered below.)
    V_true = np.array([0.02, -0.012, 0.032])
    W_true = np.array([0.004, -0.008, 0.002])
    old, new, fv = build_scene(V_true, W_true)
    res = minimizer_rv(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                       old, fv, iter_max=5, init_iter=2, init_type=2,
                       **common_kwargs())
    V = np.asarray(res.Vel)
    W = np.asarray(res.W0)
    # This dense-crossing scene has an intrinsic accuracy floor (~0.3px of
    # systematic pull from keylines matching across crossing lines), so
    # zero-init convergence is checked against that floor; exactness is
    # anchored by the from-prior test and the Jacobian-vs-autodiff test.
    np.testing.assert_allclose(V, V_true, atol=8e-3)
    np.testing.assert_allclose(W, W_true, atol=2e-3)
    assert float(res.score) < 500.0
    # information matrix should be SPD
    eig = np.linalg.eigvalsh(np.asarray(res.W_X, np.float64))
    assert eig.min() > 0


def test_minimizer_recovers_motion_from_prior_init():
    V_true = np.array([-0.02, 0.04, -0.05])
    W_true = np.array([-0.015, 0.01, -0.02])
    old, new, fv = build_scene(V_true, W_true, seed=3)
    res = minimizer_rv(
        jnp.asarray(V_true * 1.2, jnp.float32),
        jnp.asarray(W_true * 1.2, jnp.float32),
        old, fv, iter_max=5, init_iter=2, init_type=2, **common_kwargs())
    np.testing.assert_allclose(np.asarray(res.Vel), V_true, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.W0), W_true, atol=2e-3)


def test_minimizer_zero_motion():
    old, new, fv = build_scene(np.zeros(3), np.zeros(3), seed=5)
    res = minimizer_rv(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                       old, fv, iter_max=5, init_iter=2, init_type=2,
                       **common_kwargs())
    assert np.abs(np.asarray(res.Vel)).max() < 2e-3
    assert np.abs(np.asarray(res.W0)).max() < 1e-3


def test_minimizer_gates_uncertain_keylines():
    """With every keyline above the uncertainty cut-off, nothing matches
    and the state stays near zero instead of diverging."""
    V_true = np.array([0.05, 0.0, 0.0])
    old, new, fv = build_scene(V_true, np.zeros(3), seed=7)
    kw = common_kwargs()
    kw["max_s_rho"] = jnp.asarray(1e-6)   # gate everything out
    res = minimizer_rv(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                       old, fv, iter_max=5, init_iter=2, init_type=2, **kw)
    assert int(jnp.sum(res.m_id_f >= 0)) == 0
    assert np.all(np.isfinite(np.asarray(res.Vel)))
