import jax.numpy as jnp
import numpy as np

from rebvo_tpu.kernels.scale_space import (box_filter, build_scale_space,
                                           gaussian_smooth, kovesi_box_sizes,
                                           scale_space_plan)
from tests.ref_impl import box_filter_clipped, gaussian_chain


def rand_img(h=24, w=31, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w) * 765).astype(np.float32)


def test_kovesi_sizes_euroc():
    # EuRoC config: Sigma0=1.7818, 3 boxes -> [3,3,5]; second scale from
    # sigma_r * 1.2599 -> [3,5,5].
    sizes0, sr0 = kovesi_box_sizes(1.7818, 3)
    assert sizes0 == [3, 3, 5]
    sizes1, sr1 = kovesi_box_sizes(sr0 * 1.2599, 3)
    assert sizes1 == [3, 5, 5]
    assert abs(sr0 - np.sqrt(40.0 / 12.0)) < 1e-6


def test_box_filter_matches_oracle():
    img = rand_img()
    for d in (3, 5, 7):
        ours = np.asarray(box_filter(jnp.asarray(img), d))
        ref = box_filter_clipped(img, d)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_gaussian_chain_matches_oracle():
    img = rand_img(seed=3)
    sizes = [3, 3, 5]
    ours = np.asarray(gaussian_smooth(jnp.asarray(img), sizes))
    ref = gaussian_chain(img, sizes)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_gaussian_approximates_true_gaussian():
    """The box chain should approximate a Gaussian blur away from borders."""
    h = w = 65
    img = np.zeros((h, w), np.float32)
    img[h // 2, w // 2] = 1000.0
    sizes, sigma_r = kovesi_box_sizes(1.7818, 3)
    out = np.asarray(gaussian_smooth(jnp.asarray(img), sizes))
    yy, xx = np.mgrid[0:h, 0:w]
    # Second moment of the impulse response ~ sigma_r^2
    m = out / out.sum()
    var = ((xx - w // 2) ** 2 * m).sum()
    assert abs(np.sqrt(var) - sigma_r) < 0.15


def test_scale_space_outputs():
    img = jnp.asarray(rand_img(seed=5))
    ss = build_scale_space(img, 1.7818, 1.2599, 3)
    np.testing.assert_allclose(np.asarray(ss.dog),
                               np.asarray(ss.img1 - ss.img0), atol=1e-5)
    # gradient is central difference of img0
    i0 = np.asarray(ss.img0)
    np.testing.assert_allclose(np.asarray(ss.dx)[1:-1, 1:-1],
                               i0[1:-1, 2:] - i0[1:-1, :-2], atol=1e-4)
    assert np.all(np.asarray(ss.dx)[0, :] == 0)


def test_batched_scale_space():
    imgs = jnp.asarray(np.stack([rand_img(seed=i) for i in range(3)]))
    ss = build_scale_space(imgs, 1.7818, 1.2599, 3)
    single = build_scale_space(imgs[1], 1.7818, 1.2599, 3)
    np.testing.assert_allclose(np.asarray(ss.img0[1]),
                               np.asarray(single.img0), atol=1e-5)
