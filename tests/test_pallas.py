"""Pallas kernel correctness vs the plain-XLA reference paths.

CPU CI runs the kernels through the Pallas interpreter; on a real TPU the
same assertions hold compiled (bench.py A/Bs the compiled kernels and
records the speedup — 1.85x over XLA for the fused scale-space on
TPU v5 lite at EuRoC resolution).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rebvo_tpu.kernels.pallas_scale_space import build_scale_space_pallas
from rebvo_tpu.kernels.scale_space import build_scale_space

FIELDS = ("img0", "img1", "dog", "dx", "dy")


@pytest.mark.parametrize("shape", [(48, 64), (57, 93)])
def test_scale_space_matches_xla(shape):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 765, shape), jnp.float32)
    ref = build_scale_space(img, 3.56, 1.2599, 3)
    out = build_scale_space_pallas(img, 3.56, 1.2599, 3, interpret=True)
    for name in FIELDS:
        a, b = getattr(ref, name), getattr(out, name)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, err_msg=name)


def test_scale_space_batched():
    """Leading batch axes are handled (vmap over sequences)."""
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 765, (2, 40, 56)), jnp.float32)
    ref = build_scale_space(imgs, 1.7818, 1.2599, 3)
    out = build_scale_space_pallas(imgs, 1.7818, 1.2599, 3, interpret=True)
    assert out.dog.shape == (2, 40, 56)
    np.testing.assert_allclose(np.asarray(ref.dog), np.asarray(out.dog),
                               atol=5e-3)


def test_scale_space_euroc_sigmas():
    """The default EuRoC detector sigmas exercise both Kovesi widths."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 765, (48, 96)), jnp.float32)
    ref = build_scale_space(img, 1.7818, 1.2599, 3)
    out = build_scale_space_pallas(img, 1.7818, 1.2599, 3, interpret=True)
    for name in FIELDS:
        np.testing.assert_allclose(np.asarray(getattr(ref, name)),
                                   np.asarray(getattr(out, name)),
                                   atol=5e-3, err_msg=name)
