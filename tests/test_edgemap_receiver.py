"""Receiver-side edge-map accumulation: visibility hiding + depth-fill
seeding (reference edgemap_com_decoder, edgemap_com.cpp:431-640).

The reference retires accumulated segments whenever they re-project
into the current view — the freshly received map supersedes them there
(HideVisible) — and seeds its dense depth filler from segment spans
behind confidence/geometry gates (fillDepthMap)."""

import numpy as np

from rebvo_tpu.io.edgemap_compress import (EdgeMapAccumulator,
                                           segments_to_fill_seed)

ZF, CX, CY, W, H = 400.0, 376.0, 240.0, 752, 480
EYE = np.eye(3)
ZERO = np.zeros(3)


def _wall_segments(z, xs, y0=-0.5, y1=0.5, s_rho=0.02):
    """Vertical segments of a fronto-parallel wall at depth z, at world
    x positions xs (viewed from the origin): endpoints (x, y, rho, s)."""
    segs = []
    rho = 1.0 / z
    for xw in xs:
        px = xw / z * ZF + CX
        segs.append(((px, y0 / z * ZF + CY, rho, s_rho),
                     (px, y1 / z * ZF + CY, rho, s_rho)))
    return segs


def test_fresh_map_hides_accumulated_far_wall():
    """Two-surface scene: a near wall received later must hide the far
    wall where the new view covers it; far segments outside the view
    survive."""
    acc = EdgeMapAccumulator(ZF, CX, CY, W, H)

    # packet 1: far wall (z=8) spanning a wide x range
    far_x = np.linspace(-6.0, 6.0, 13)           # +-6 m at z=8
    pkt_far = dict(k_scale=1.0, segments=_wall_segments(8.0, far_x))
    n1 = acc.add_packet(pkt_far, EYE, ZERO)
    assert n1 == 13

    # current view: camera advanced to z=6 — only the central ~2 m of
    # the far wall is still inside its frustum; a near wall (z=7 in
    # world, 1 m ahead) arrives in this packet
    Pos2 = np.array([0.0, 0.0, 6.0])
    near = _wall_segments(1.0, np.linspace(-0.4, 0.4, 5))
    pkt_near = dict(k_scale=1.0, segments=near)
    acc.add_packet(pkt_near, EYE, Pos2)

    world = acc.visible_segments_world()
    zs = world[..., 2].mean(axis=1)
    # the near wall (world z = 7) is present...
    assert np.sum(np.isclose(zs, 7.0, atol=0.01)) == 5
    # ...central far-wall segments were hidden, peripheral ones survive
    far_alive = world[np.isclose(zs, 8.0, atol=0.01)]
    assert 0 < far_alive.shape[0] < 13
    xs_alive = far_alive[..., 0].mean(axis=1)
    # everything surviving is OUTSIDE the new view's frustum
    # (|x| / (8-6) * zf > cx  =>  |x| > 1.88)
    assert np.all(np.abs(xs_alive) > 1.8), xs_alive
    # and everything central (re-projecting into the view) was hidden
    assert not np.any(np.abs(xs_alive) < 1.8)


def test_hide_visible_respects_behind_camera():
    """Segments BEHIND the current camera must not be hidden (the
    rho > 0 term of the reference's test)."""
    acc = EdgeMapAccumulator(ZF, CX, CY, W, H)
    pkt = dict(k_scale=1.0, segments=_wall_segments(4.0, [0.0]))
    acc.add_packet(pkt, EYE, ZERO)
    # camera far past the wall, looking further along +z
    alive = acc.hide_visible(EYE, np.array([0.0, 0.0, 10.0]))
    assert alive == 1          # behind the camera -> not in view -> kept
    alive = acc.hide_visible(EYE, ZERO)
    assert alive == 0          # back at the origin it IS in view -> hidden


def test_fill_seed_gates_and_interpolation():
    segs = []
    # good surface segment: fronto-parallel, confident
    segs.append(((100.0, 100.0, 0.5, 0.02), (180.0, 100.0, 0.5, 0.02)))
    # low confidence (rho/s < v_thresh) -> rejected
    segs.append(((300.0, 100.0, 0.5, 0.4), (380.0, 100.0, 0.5, 0.4)))
    # line-of-sight segment (depth discontinuity): same image position
    # span but huge depth change -> angle gate rejects
    segs.append(((500.0, 100.0, 1.0, 0.02), (503.0, 100.0, 0.05, 0.02)))
    x, y, rho, s = segments_to_fill_seed(segs, zf=ZF, cx=CX, cy=CY,
                                         v_thresh=2.0, a_thresh_deg=45.0)
    assert x.size == 80                      # only the good span sampled
    assert np.all((x >= 100) & (x <= 180))
    np.testing.assert_allclose(rho, 0.5, rtol=1e-6)
    np.testing.assert_allclose(s, 0.02, rtol=1e-6)


def test_fill_seed_feeds_depth_filler():
    """Seeded spans drive the dense fill: the filled block depth matches
    the segment depth around the seeded rows."""
    import jax.numpy as jnp

    from rebvo_tpu.frontend.state import KeylineMap
    from rebvo_tpu.kernels.depth_filler import fill_depth

    segs = [((100.0, 80.0, 0.5, 0.02), (400.0, 80.0, 0.5, 0.02)),
            ((100.0, 400.0, 0.2, 0.02), (400.0, 400.0, 0.2, 0.02))]
    x, y, rho, s = segments_to_fill_seed(segs, zf=ZF, cx=CX, cy=CY)
    K = 1 << int(np.ceil(np.log2(max(x.size, 2))))
    klm = KeylineMap.empty(K)
    pad = lambda a, f: jnp.asarray(np.concatenate(
        [a, np.full(K - a.size, f, np.float32)]))
    klm = klm._replace(
        valid=jnp.asarray(np.arange(K) < x.size),
        x=pad(x, 0), y=pad(y, 0), rho=pad(rho, 1.0), s_rho=pad(s, 100.0))
    fill = fill_depth(klm, width=W, height=H, block=8)
    r = np.asarray(fill.rho)
    gh = r.shape[0]
    np.testing.assert_allclose(r[80 // 8, 20:40], 0.5, atol=0.05)
    np.testing.assert_allclose(r[400 // 8, 20:40], 0.2, atol=0.05)
