import jax.numpy as jnp
import numpy as np

from rebvo_tpu.kernels.edge_detect import (detect_candidates, detect_keylines,
                                           re_estimate_thresh,
                                           update_detector_threshold)
from rebvo_tpu.kernels.scale_space import build_scale_space
from tests.ref_impl import detect_pixels


def synthetic_edge_image(h=48, w=64, edge_x=30.3):
    """Vertical intensity step with a smooth ramp -> one vertical edge."""
    xx = np.arange(w, dtype=np.float32)
    ramp = 1.0 / (1.0 + np.exp(-(xx - edge_x) * 2.0))
    img = np.tile(ramp * 600.0 + 50.0, (h, 1))
    return img.astype(np.float32)


PARAMS = dict(win_s=2, per_hist=0.4, dog_thresh=0.095259868922420,
              max_img_value=765.0)


def test_candidates_match_oracle():
    img = synthetic_edge_image()
    rng = np.random.RandomState(0)
    img = img + rng.rand(*img.shape).astype(np.float32) * 4.0
    ss = build_scale_space(jnp.asarray(img), 1.7818, 1.2599, 3)
    thresh = 0.01
    cand = detect_candidates(ss, PARAMS["win_s"], PARAMS["per_hist"],
                             jnp.asarray(thresh), PARAMS["dog_thresh"],
                             PARAMS["max_img_value"])
    hits = detect_pixels(np.asarray(ss.dog, np.float64),
                         np.asarray(ss.dx, np.float64),
                         np.asarray(ss.dy, np.float64),
                         PARAMS["win_s"], PARAMS["per_hist"], thresh,
                         PARAMS["dog_thresh"], PARAMS["max_img_value"])
    mask = np.asarray(cand.mask)
    ref_mask = np.zeros_like(mask)
    for (y, x, *_rest) in hits:
        ref_mask[y, x] = True
    # float32 vs float64 rounding may flip borderline pixels; require near
    # perfect agreement.
    agree = (mask == ref_mask).mean()
    assert agree > 0.999, f"mask agreement {agree}"
    assert ref_mask.sum() > 10


def test_keyline_positions_on_vertical_edge():
    img = synthetic_edge_image(edge_x=30.3)
    ss = build_scale_space(jnp.asarray(img), 1.7818, 1.2599, 3)
    klm, mask_img, kn = detect_keylines(
        ss, jnp.asarray(0.01), K=256, kl_max=256, win_s=2,
        per_hist=PARAMS["per_hist"], dog_thresh=PARAMS["dog_thresh"],
        max_img_value=PARAMS["max_img_value"],
        cx=jnp.asarray(32.0), cy=jnp.asarray(24.0))
    kn = int(kn)
    assert kn > 10
    xs = np.asarray(klm.x)[:kn]
    # All keylines should sit near the true edge; the DoG zero crossing of a
    # sigmoid edge is at its center.
    assert np.all(np.abs(xs - 30.3) < 1.5), xs
    # gradients should be horizontal (vertical edge)
    gx = np.asarray(klm.gx)[:kn]
    gy = np.asarray(klm.gy)[:kn]
    assert np.all(np.abs(gy) < 0.2 * np.abs(gx))
    # hom coords
    np.testing.assert_allclose(np.asarray(klm.px)[:kn], xs - 32.0, atol=1e-5)


def test_edge_chain_links_vertical():
    """On a clean vertical edge, keylines should chain along y."""
    img = synthetic_edge_image(edge_x=30.0)
    ss = build_scale_space(jnp.asarray(img), 1.7818, 1.2599, 3)
    klm, _, kn = detect_keylines(
        ss, jnp.asarray(0.01), K=256, kl_max=256, win_s=2,
        per_hist=PARAMS["per_hist"], dog_thresh=PARAMS["dog_thresh"],
        max_img_value=PARAMS["max_img_value"],
        cx=jnp.asarray(32.0), cy=jnp.asarray(24.0))
    kn = int(kn)
    n_id = np.asarray(klm.n_id)[:kn]
    p_id = np.asarray(klm.p_id)[:kn]
    # most interior keylines have both neighbours
    both = ((n_id >= 0) & (p_id >= 0)).mean()
    assert both > 0.7
    # links are reciprocal for most: p_id[n_id[i]] == i
    ok = 0
    tot = 0
    for i in range(kn):
        if n_id[i] >= 0:
            tot += 1
            if p_id[n_id[i]] == i:
                ok += 1
    assert tot > 0 and ok / tot > 0.8


def test_kl_max_truncation():
    img = synthetic_edge_image()
    ss = build_scale_space(jnp.asarray(img), 1.7818, 1.2599, 3)
    klm, _, kn = detect_keylines(
        ss, jnp.asarray(0.01), K=256, kl_max=5, win_s=2,
        per_hist=PARAMS["per_hist"], dog_thresh=PARAMS["dog_thresh"],
        max_img_value=PARAMS["max_img_value"],
        cx=jnp.asarray(32.0), cy=jnp.asarray(24.0))
    assert int(kn) == 5
    assert int(jnp.sum(klm.valid)) == 5


def test_update_thresh():
    t = update_detector_threshold(jnp.asarray(0.01), jnp.asarray(5000),
                                  kl_ref=12000, gain=5e-7, thresh_max=0.5,
                                  thresh_min=0.005)
    # fewer keylines than reference -> threshold decreases
    assert float(t) < 0.01
    t2 = update_detector_threshold(jnp.asarray(0.0051), jnp.asarray(20000),
                                   kl_ref=12000, gain=5e-3, thresh_max=0.5,
                                   thresh_min=0.005)
    assert float(t2) == 0.5  # clamped


def test_re_estimate_thresh_keeps_top_k():
    from rebvo_tpu.frontend.state import KeylineMap
    K = 128
    klm = KeylineMap.empty(K)
    rng = np.random.RandomState(1)
    n_m = np.sort(rng.rand(K).astype(np.float32) * 100)[::-1].copy()
    klm = klm._replace(valid=jnp.ones(K, bool), n_m=jnp.asarray(n_m))
    th = float(re_estimate_thresh(klm, knum=30, nbins=100))
    kept = (n_m >= th).sum()
    assert 25 <= kept <= 40
