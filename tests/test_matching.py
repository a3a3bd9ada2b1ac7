import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import so3_exp
from rebvo_tpu.frontend.state import KeylineMap, RHO_MAX
from rebvo_tpu.kernels.matching import directed_matching, forward_match
from tests.synthetic import lines_scene, make_map, transform_points

ZFM = 400.0
CX, CY = 376.0, 240.0
W_IMG, H_IMG = 752, 480
K = 2048


def mask_image_for(klm, n):
    """Build the id-mask image the detector would have produced."""
    mask = np.full((H_IMG, W_IMG), -1, np.int32)
    x = np.asarray(klm.x)[:n]
    y = np.asarray(klm.y)[:n]
    for i in range(n):
        xi, yi = int(round(x[i])), int(round(y[i]))
        if 0 <= xi < W_IMG and 0 <= yi < H_IMG:
            mask[yi, xi] = i
    return jnp.asarray(mask)


def test_forward_match_transfers_depth():
    old = KeylineMap.empty(8)
    new = KeylineMap.empty(8)
    old = old._replace(
        valid=jnp.asarray([True] * 4 + [False] * 4),
        rho=jnp.asarray([0.5, 1.5, 0.7, 2.0] + [1.0] * 4, jnp.float32),
        s_rho=jnp.asarray([0.1, 0.2, 0.3, 0.4] + [20.0] * 4, jnp.float32),
        m_num=jnp.asarray([3, 5, 1, 2] + [0] * 4, jnp.int32),
        px=jnp.arange(8, dtype=jnp.float32),
    )
    new = new._replace(valid=jnp.asarray([True] * 3 + [False] * 5))
    # sources 1 and 3 both map to target 0 -> larger rho (2.0) wins
    m_id_f = jnp.asarray([2, 0, -1, 0, -1, -1, -1, -1], jnp.int32)
    out, n = forward_match(old, new, m_id_f)
    assert int(n) == 2  # targets 0 and 2 (target 2 valid? idx 2 True) ...
    assert float(out.rho[0]) == 2.0       # front surface won
    assert int(out.m_id[0]) == 3
    assert int(out.m_num[0]) == 3         # m_num of source 3 + 1
    assert float(out.rho[2]) == 0.5       # from source 0
    assert float(out.p0x[2]) == 0.0       # source 0's px
    assert int(out.m_id[1]) == -1         # untouched


def test_directed_matching_recovers_matches():
    """New map back-rotates onto the old map's mask and finds the right
    keylines, cloning their depth."""
    V_true = np.array([0.02, -0.012, 0.03])
    W_true = np.array([0.004, -0.006, 0.002])
    P, ang = lines_scene(seed=2)
    n = P.shape[0]
    old = make_map(P, ang, ZFM, CX, CY, K, s_rho=0.08)
    R = np.asarray(so3_exp(jnp.asarray(W_true, jnp.float32)), np.float64)
    Pn = transform_points(P, R, V_true)
    new = make_map(Pn, ang + W_true[2], ZFM, CX, CY, K, s_rho=0.5)
    old_mask = mask_image_for(old, n)

    # The old map in the pipeline has been forward-rotated by R0 before
    # directed matching; its mask stays at detection positions. Here we
    # skip the rotation (exact depths already set) and pass BackRot = R^T
    # ... the back-rotation maps new hom coords into the old frame.
    res = directed_matching(
        new, old, old_mask,
        Vel=jnp.asarray(V_true, jnp.float32),
        RVel=jnp.eye(3, dtype=jnp.float32) * 1e-4,
        BackRot=jnp.asarray(R.T, jnp.float32),
        zfm=jnp.asarray(ZFM), cx=jnp.asarray(CX), cy=jnp.asarray(CY),
        width=W_IMG, height=H_IMG, max_steps=44,
        min_thr_mod=1.0, min_thr_ang=45.0, max_radius=40.0,
        loc_uncertainty=2.0)
    nm = int(res.nmatch)
    assert nm > 0.85 * n, f"only {nm}/{n} matched"
    # matched keylines must have cloned the old rho within the same line
    m = np.asarray(res.new.m_id)[:n]
    rho_new = np.asarray(res.new.rho)[:n]
    rho_old = np.asarray(old.rho)
    ok = m >= 0
    np.testing.assert_allclose(rho_new[ok], rho_old[m[ok]], rtol=1e-6)
    # and the matched positions should be close to the back-rotated query
    x_old = np.asarray(old.x)
    y_old = np.asarray(old.y)
    x_q = np.asarray(new.x)[:n]
    d = np.hypot(x_old[m[ok]] - x_q[ok], 0)  # same-line ambiguity in y
    assert np.median(d) < 6.0


def test_directed_matching_rejects_on_gradient():
    """Perpendicular gradients must not match."""
    P, ang = lines_scene(n_lines=1, seed=4)
    n = P.shape[0]
    old = make_map(P, ang, ZFM, CX, CY, 512, s_rho=0.1)
    new = make_map(P, ang + np.pi / 2, ZFM, CX, CY, 512, s_rho=0.5)
    old_mask = mask_image_for(old, n)
    res = directed_matching(
        new, old, old_mask,
        Vel=jnp.zeros(3, jnp.float32),
        RVel=jnp.eye(3, dtype=jnp.float32) * 1e-4,
        BackRot=jnp.eye(3, dtype=jnp.float32),
        zfm=jnp.asarray(ZFM), cx=jnp.asarray(CX), cy=jnp.asarray(CY),
        width=W_IMG, height=H_IMG, max_steps=44,
        min_thr_mod=1.0, min_thr_ang=45.0, max_radius=40.0,
        loc_uncertainty=2.0)
    assert int(res.nmatch) == 0


def test_directed_matching_zero_velocity_uses_normal_direction():
    P, ang = lines_scene(n_lines=3, seed=6)
    n = P.shape[0]
    old = make_map(P, ang, ZFM, CX, CY, 1024, s_rho=0.1)
    new = make_map(P, ang, ZFM, CX, CY, 1024, s_rho=0.5)
    old_mask = mask_image_for(old, n)
    res = directed_matching(
        new, old, old_mask,
        Vel=jnp.zeros(3, jnp.float32),
        RVel=jnp.eye(3, dtype=jnp.float32) * 1e-4,
        BackRot=jnp.eye(3, dtype=jnp.float32),
        zfm=jnp.asarray(ZFM), cx=jnp.asarray(CX), cy=jnp.asarray(CY),
        width=W_IMG, height=H_IMG, max_steps=44,
        min_thr_mod=1.0, min_thr_ang=45.0, max_radius=40.0,
        loc_uncertainty=2.0)
    # identical maps, zero motion: everything should match itself-ish
    assert int(res.nmatch) > 0.9 * n


# ---------------------------------------------------------------------------
# directed_matching_field: the production default (MatchFieldStride=4)
# ---------------------------------------------------------------------------


def field_image_for(klm, radius=6):
    from rebvo_tpu.kernels.field import build_field
    return build_field(klm, jnp.asarray(0.0), radius=radius,
                       height=H_IMG, width=W_IMG)


def _match_pair():
    """Old/new maps + mask/field of the same transformed line scene."""
    V_true = np.array([0.02, -0.012, 0.03])
    W_true = np.array([0.004, -0.006, 0.002])
    P, ang = lines_scene(seed=2)
    n = P.shape[0]
    old = make_map(P, ang, ZFM, CX, CY, K, s_rho=0.08)
    R = np.asarray(so3_exp(jnp.asarray(W_true, jnp.float32)), np.float64)
    Pn = transform_points(P, R, V_true)
    new = make_map(Pn, ang + W_true[2], ZFM, CX, CY, K, s_rho=0.5)
    kw = dict(Vel=jnp.asarray(V_true, jnp.float32),
              RVel=jnp.eye(3, dtype=jnp.float32) * 1e-4,
              BackRot=jnp.asarray(R.T, jnp.float32),
              zfm=jnp.asarray(ZFM), cx=jnp.asarray(CX), cy=jnp.asarray(CY),
              width=W_IMG, height=H_IMG, min_thr_mod=1.0, min_thr_ang=45.0,
              max_radius=40.0, loc_uncertainty=2.0)
    return old, new, n, kw


def test_field_matcher_parity_with_mask_walk():
    """The field-sampled matcher must agree with the reference-shaped
    mask walk: stride 1 near-identical, production stride 4 with >= 95%
    match agreement and no net match loss."""
    from rebvo_tpu.kernels.matching import directed_matching_field
    old, new, n, kw = _match_pair()
    old_mask = mask_image_for(old, n)
    field = field_image_for(old)
    rm = directed_matching(new, old, old_mask, max_steps=44, **kw)
    m_mask = np.asarray(rm.new.m_id)[:n]
    rho_old = np.asarray(old.rho)
    assert int(rm.nmatch) > 0.85 * n

    for stride, id_floor in ((1, 0.97), (4, 0.95)):
        steps = int(40 / stride) + 3
        rf = directed_matching_field(new, old, field, max_steps=steps,
                                     stride=stride, **kw)
        m_f = np.asarray(rf.new.m_id)[:n]
        # no net match loss vs the mask walk
        assert int(rf.nmatch) >= 0.95 * int(rm.nmatch), (
            stride, int(rf.nmatch), int(rm.nmatch))
        both = (m_mask >= 0) & (m_f >= 0)
        assert both.sum() > 0.9 * int(rm.nmatch)
        id_agree = (m_mask[both] == m_f[both]).mean()
        assert id_agree >= id_floor, (stride, id_agree)
        # where ids differ, the cloned depth must still agree (adjacent
        # keylines of the same edge carry the same geometry)
        rho_agree = np.isclose(rho_old[m_mask[both]], rho_old[m_f[both]],
                               rtol=0.05).mean()
        assert rho_agree >= 0.99, (stride, rho_agree)


def _ladder_fixture(rho_new):
    """A single query keyline with two acceptable candidates on its
    search line at displacements t=4 and t=12; which one wins is purely
    the ladder's near-to-predicted-displacement priority."""
    Kc = 64
    zfm = ZFM

    def base(K):
        klm = KeylineMap.empty(K)
        return klm

    # query at image x=400, y=240 (hom 24, 0); gradient along +x
    new = base(Kc)._replace(
        valid=jnp.asarray([True] + [False] * (Kc - 1)),
        px=jnp.asarray([24.0] + [0] * (Kc - 1), jnp.float32),
        py=jnp.zeros((Kc,), jnp.float32),
        x=jnp.asarray([400.0] + [0] * (Kc - 1), jnp.float32),
        y=jnp.full((Kc,), 240.0, jnp.float32),
        gx=jnp.full((Kc,), 100.0, jnp.float32),
        gy=jnp.zeros((Kc,), jnp.float32),
        ux=jnp.ones((Kc,), jnp.float32), uy=jnp.zeros((Kc,), jnp.float32),
        n_m=jnp.full((Kc,), 100.0, jnp.float32),
        rho=jnp.full((Kc,), rho_new, jnp.float32),
        s_rho=jnp.full((Kc,), 2.0, jnp.float32))
    # Vel = [-0.01, 0, 0] -> t_x = 4 px per unit rho, along +x
    # candidates: id0 at x=404 (t=4, rho=1), id1 at x=412 (t=12, rho=3)
    old = base(Kc)._replace(
        valid=jnp.asarray([True, True] + [False] * (Kc - 2)),
        px=jnp.asarray([28.0, 36.0] + [0] * (Kc - 2), jnp.float32),
        py=jnp.zeros((Kc,), jnp.float32),
        x=jnp.asarray([404.0, 412.0] + [0] * (Kc - 2), jnp.float32),
        y=jnp.full((Kc,), 240.0, jnp.float32),
        gx=jnp.full((Kc,), 100.0, jnp.float32),
        gy=jnp.zeros((Kc,), jnp.float32),
        ux=jnp.ones((Kc,), jnp.float32), uy=jnp.zeros((Kc,), jnp.float32),
        n_m=jnp.full((Kc,), 100.0, jnp.float32),
        rho=jnp.asarray([1.0, 3.0] + [1.0] * (Kc - 2), jnp.float32),
        s_rho=jnp.full((Kc,), 1.5, jnp.float32))
    field = field_image_for(old)
    kw = dict(Vel=jnp.asarray([-0.01, 0.0, 0.0], jnp.float32),
              RVel=jnp.eye(3, dtype=jnp.float32) * 1e-6,
              BackRot=jnp.eye(3, dtype=jnp.float32),
              zfm=jnp.asarray(zfm), cx=jnp.asarray(CX), cy=jnp.asarray(CY),
              width=W_IMG, height=H_IMG, min_thr_mod=1.0, min_thr_ang=45.0,
              max_radius=40.0, loc_uncertainty=2.0)
    return new, old, field, kw


def test_field_ladder_prefers_near_predicted_displacement():
    """Two acceptable candidates: the ladder must select the one nearer
    the predicted displacement dq_rho = |t|*rho (the reference's
    inward-outward walk order, edge_tracker.cpp:231-258)."""
    from rebvo_tpu.kernels.matching import directed_matching_field
    # rho_new = 1 -> dq_rho = 4 -> candidate at t=4 (id 0) is nearer
    new, old, field, kw = _ladder_fixture(rho_new=1.0)
    res = directed_matching_field(new, old, field, max_steps=43, stride=1,
                                  **kw)
    assert int(res.new.m_id[0]) == 0
    # rho_new = 3 -> dq_rho = 12 -> candidate at t=12 (id 1) is nearer
    new, old, field, kw = _ladder_fixture(rho_new=3.0)
    res = directed_matching_field(new, old, field, max_steps=43, stride=1,
                                  **kw)
    assert int(res.new.m_id[0]) == 1
