import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import (CameraModel, rotate_gradients,
                                     rotate_hom_points, skew, so3_exp,
                                     so3_log, rotation_to_quaternion)


def rand_w(seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(3) * scale, jnp.float32)


def test_so3_exp_identity():
    R = so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_so3_exp_orthonormal():
    for s in range(5):
        R = np.asarray(so3_exp(rand_w(s)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1) < 1e-5


def test_so3_log_roundtrip():
    for s in range(8):
        w = rand_w(s, scale=0.8)
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(w2, w, atol=1e-5)


def test_so3_log_small_angle():
    w = jnp.asarray([1e-5, -2e-5, 3e-6], jnp.float32)
    np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-7)


def test_so3_exp_matches_rodrigues():
    w = np.array([0.3, -0.2, 0.5])
    theta = np.linalg.norm(w)
    k = w / theta
    K = np.asarray(skew(jnp.asarray(k)))
    R_expected = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
    np.testing.assert_allclose(so3_exp(jnp.asarray(w, jnp.float32)),
                               R_expected, atol=1e-6)


def test_quaternion_unit_norm():
    q = rotation_to_quaternion(so3_exp(rand_w(3)))
    assert abs(float(jnp.linalg.norm(q)) - 1) < 1e-5


def test_camera_distort_undistort_roundtrip():
    cam = CameraModel.make(458.654, 457.296, 367.215, 248.375,
                           kc2=-0.2834, kc4=0.0739)
    hx = jnp.asarray([10.0, -50.0, 120.0, 0.0])
    hy = jnp.asarray([5.0, 80.0, -90.0, 0.0])
    dx, dy = cam.distort_hom(hx, hy)
    ux, uy = cam.undistort_hom(dx, dy, newton_iters=8)
    # undistort ignores tangential and kc6 (as in the reference), and maps
    # onto the zfm plane; compare against hom coords scaled to zfm.
    np.testing.assert_allclose(ux, hx * cam.zfm / cam.fx, rtol=2e-3, atol=0.05)
    np.testing.assert_allclose(uy, hy * cam.zfm / cam.fy, rtol=2e-3, atol=0.05)


def test_project_unproject_i3p():
    cam = CameraModel.make(400.0, 400.0, 376.0, 240.0)
    px = jnp.asarray([10.0, -30.0])
    py = jnp.asarray([20.0, 40.0])
    rho = jnp.asarray([0.5, 2.0])
    X, Y, Z = cam.unproject_i3p(px, py, rho)
    px2, py2, rho2 = cam.project_i3p(X, Y, Z)
    np.testing.assert_allclose(px2, px, rtol=1e-6)
    np.testing.assert_allclose(py2, py, rtol=1e-6)
    np.testing.assert_allclose(rho2, rho, rtol=1e-6)


def test_rotate_hom_points_identity():
    R = jnp.eye(3)
    px = jnp.asarray([1.0, 2.0])
    py = jnp.asarray([3.0, 4.0])
    rho = jnp.asarray([0.5, 1.0])
    s = jnp.asarray([0.1, 0.2])
    out = rotate_hom_points(R, px, py, rho, s, jnp.asarray(400.0))
    np.testing.assert_allclose(out[0], px, atol=1e-6)
    np.testing.assert_allclose(out[2], rho, atol=1e-6)


def test_rotate_hom_points_consistent_with_3d():
    """Rotating hom points must equal project(R @ unproject)."""
    cam = CameraModel.make(400.0, 400.0, 376.0, 240.0)
    R = so3_exp(jnp.asarray([0.02, -0.03, 0.01], jnp.float32))
    px = jnp.asarray([12.0, -80.0, 33.0])
    py = jnp.asarray([-25.0, 60.0, 5.0])
    rho = jnp.asarray([0.3, 1.2, 2.0])
    s = jnp.ones(3) * 0.5
    px2, py2, rho2, _ = rotate_hom_points(R, px, py, rho, s, cam.zfm)

    X, Y, Z = cam.unproject_i3p(px, py, rho)
    P = jnp.stack([X, Y, Z], axis=0)
    Pr = R @ P
    ex, ey, erho = cam.project_i3p(Pr[0], Pr[1], Pr[2])
    np.testing.assert_allclose(px2, ex, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(py2, ey, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(rho2, erho, rtol=1e-5, atol=1e-6)


def test_rotate_gradients():
    R = so3_exp(jnp.asarray([0.0, 0.0, jnp.pi / 2], jnp.float32))
    gx, gy = rotate_gradients(R, jnp.asarray([1.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(gx, [0.0], atol=1e-6)
    np.testing.assert_allclose(gy, [1.0], atol=1e-6)
