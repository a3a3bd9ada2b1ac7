"""ROS output-parity tests: the pure message-shaping functions that the
bridge publishes (EdgeMap payload, PointCloud2 layout, TF quaternion) —
testable without a ROS environment (rebvo_nodelet.cpp:145-241)."""

import numpy as np

from rebvo_tpu.apps.ros_bridge import (build_edgemap_dict, build_pointcloud2,
                                       build_tf, unproject_keylines)
from rebvo_tpu.frontend.state import KeylineMap


def _klm(K=16, valid_n=10, seed=0):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    klm = KeylineMap.empty(K)
    v = np.zeros(K, bool)
    v[:valid_n] = True
    return klm._replace(
        valid=jnp.asarray(v),
        x=jnp.asarray(rng.uniform(0, 100, K).astype(np.float32)),
        y=jnp.asarray(rng.uniform(0, 100, K).astype(np.float32)),
        gx=jnp.asarray(rng.randn(K).astype(np.float32)),
        gy=jnp.asarray(rng.randn(K).astype(np.float32)),
        px=jnp.asarray(rng.uniform(-50, 50, K).astype(np.float32)),
        py=jnp.asarray(rng.uniform(-50, 50, K).astype(np.float32)),
        rho=jnp.asarray(rng.uniform(0.2, 2.0, K).astype(np.float32)),
        s_rho=jnp.asarray(rng.uniform(0.01, 1.0, K).astype(np.float32)),
        m_id=jnp.asarray(rng.randint(-1, K, K).astype(np.int32)),
        m_num=jnp.asarray(rng.randint(0, 9, K).astype(np.int32)),
        p_id=jnp.asarray(rng.randint(-1, K, K).astype(np.int32)),
        n_id=jnp.asarray(rng.randint(-1, K, K).astype(np.int32)))


def test_edgemap_payload_fields():
    klm = _klm()
    em = build_edgemap_dict(klm, 1.0)
    n = 10
    assert em["KlGrad"].shape == (n, 2)
    assert em["KlImgPos"].shape == (n, 2)
    assert em["invDepth"].dtype == np.float64       # msg float64
    assert em["KlPrevMatchID"].dtype == np.int16    # msg int16
    np.testing.assert_allclose(em["invDepth"],
                               np.asarray(klm.rho)[:n], rtol=1e-6)
    np.testing.assert_allclose(em["KlFocPos"][:, 0],
                               np.asarray(klm.px)[:n], rtol=1e-6)


def test_unproject_applies_metric_scale():
    """unprojectHomCordVec(p_m, rho/K): doubling K doubles the depths."""
    klm = _klm()
    zfm = 200.0
    p1 = unproject_keylines(klm, 1.0, zfm)
    p2 = unproject_keylines(klm, 2.0, zfm)
    np.testing.assert_allclose(p2, 2.0 * p1, rtol=1e-5)
    # geometry: x/z = px/zfm
    np.testing.assert_allclose(p1[:, 0] / p1[:, 2],
                               np.asarray(klm.px)[:10] / zfm, rtol=1e-5)
    np.testing.assert_allclose(p1[:, 2], 1.0 / np.asarray(klm.rho)[:10],
                               rtol=1e-5)


def test_pointcloud2_binary_layout():
    pts = np.asarray([[1.0, 2.0, 3.0], [-4.0, 5.5, 0.25]], np.float32)
    pc = build_pointcloud2(pts)
    assert pc["width"] == 2 and pc["point_step"] == 16
    assert [f["offset"] for f in pc["fields"]] == [0, 4, 8]
    back = np.frombuffer(pc["data"], np.uint8).reshape(2, 16)
    xyz = back[:, :12].copy().view("<f4").reshape(2, 3)
    np.testing.assert_array_equal(xyz, pts)


def test_tf_quaternion_axis_angle():
    # 90 degrees about z
    quat, trans = build_tf(np.asarray([0.0, 0.0, np.pi / 2]),
                           np.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(quat,
                               [0.0, 0.0, np.sin(np.pi / 4),
                                np.cos(np.pi / 4)], atol=1e-12)
    np.testing.assert_array_equal(trans, [1.0, 2.0, 3.0])
    # zero rotation -> identity quaternion
    quat0, _ = build_tf(np.zeros(3), np.zeros(3))
    np.testing.assert_array_equal(quat0, [0, 0, 0, 1])
