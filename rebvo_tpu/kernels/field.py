"""Auxiliary match field: nearest-keyline lookup image.

Re-implements global_tracker::build_field (reference
src/mtracklib/global_tracker.cpp:61-105): every keyline paints a +-radius
segment along its gradient direction into an image of (keyline id,
distance) pairs, nearest keyline winning.

TPU-first design: the serial paint loop with its read-modify-write
conflict resolution becomes one scatter-min of packed (distance << SHIFT
| keyline-slot) keys over all keyline x offset pairs — associative, so
XLA can lower it without ordering constraints, and ties resolve to the
lowest slot id exactly like the reference's first-writer-wins rule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rebvo_tpu.frontend.state import KeylineMap

Array = jax.Array

_SLOT_BITS = 18          # supports K up to 262144 (> KEYLINE_MAX=50000)
_EMPTY = jnp.iinfo(jnp.int32).max


@partial(jax.jit, static_argnames=("radius", "height", "width"))
def build_field(klm: KeylineMap, min_mod: Array, *, radius: int,
                height: int, width: int) -> Array:
    """Returns the field image [H, W] int32: keyline slot id or -1.

    `min_mod` gates weak keylines out of the field (the reference passes
    the re-tuned detector threshold, rebvo_second_t.cpp:177).
    """
    K = klm.K
    ok = klm.valid & (klm.n_m >= min_mod)

    t = jnp.arange(-radius, radius, dtype=klm.x.dtype)       # [2R]
    # round2int_positive = floor(v + 0.5) (reference util round)
    xi = jnp.floor(klm.ux[:, None] * t[None, :] + klm.x[:, None] + 0.5)
    yi = jnp.floor(klm.uy[:, None] * t[None, :] + klm.y[:, None] + 0.5)
    xi = xi.astype(jnp.int32)
    yi = yi.astype(jnp.int32)
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & ok[:, None]

    at = jnp.abs(t).astype(jnp.int32)[None, :]               # distance
    # Equal-distance ties go to the HIGHER slot id (the reference's paint
    # loop overwrites on at == dist, so the last writer wins) — encode the
    # slot inverted so scatter-min picks the largest id on ties.
    slot = jnp.arange(K, dtype=jnp.int32)[:, None]
    key = (at << _SLOT_BITS) | (K - 1 - slot)

    flat_idx = jnp.where(inb, yi * width + xi, height * width)
    field = jnp.full((height * width,), _EMPTY, dtype=jnp.int32)
    field = field.at[flat_idx.reshape(-1)].min(key.reshape(-1), mode="drop")

    ikl = jnp.where(field == _EMPTY, -1,
                    K - 1 - (field & ((1 << _SLOT_BITS) - 1)))
    return ikl.reshape(height, width)
