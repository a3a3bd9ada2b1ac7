"""Keyframe store.

The reference snapshots an edge_tracker (+pose state) into a `keyframe`
(reference include/mtracklib/keyframe.h:33-118) kept in an append-only
std::vector with binary (de)serialisation (keyframe.cpp:73-169).

TPU-first, keyframes live as a fixed-capacity ring of stacked keyline
SoAs — one device-resident pytree whose leading axis is the keyframe
slot — so the BA backend can map/shard over keyframes without host
round-trips. (De)serialisation uses npz.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.frontend.state import KeylineMap

Array = jax.Array


class KeyframeStore(NamedTuple):
    """Ring buffer of keyframes; all arrays lead with the slot axis [F]."""

    valid: Array      # [F] bool
    t: Array          # [F]
    K_scale: Array    # [F] scale at capture (keyframe.h K)
    Pose: Array       # [F, 3, 3] global rotation at capture
    Pos: Array        # [F, 3] global position at capture
    Vel: Array        # [F, 3]
    klm: KeylineMap   # leaves [F, K]
    next_slot: Array  # int32 ring cursor
    count: Array      # int32 number of live keyframes

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]

    @staticmethod
    def empty(F: int, K: int, dtype=jnp.float32) -> "KeyframeStore":
        return KeyframeStore(
            valid=jnp.zeros((F,), bool),
            t=jnp.zeros((F,), dtype),
            K_scale=jnp.ones((F,), dtype),
            Pose=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (F, 3, 3)).copy(),
            Pos=jnp.zeros((F, 3), dtype),
            Vel=jnp.zeros((F, 3), dtype),
            klm=jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (F,) + a.shape).copy(),
                KeylineMap.empty(K, dtype=dtype)),
            next_slot=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
        )


def push_keyframe(store: KeyframeStore, klm: KeylineMap, t: Array,
                  K_scale: Array, Pose: Array, Pos: Array,
                  Vel: Array) -> KeyframeStore:
    """Insert a keyframe at the ring cursor (jittable)."""
    s = store.next_slot
    set_at = lambda buf, val: buf.at[s].set(val)
    klm2 = jax.tree_util.tree_map(lambda buf, v: buf.at[s].set(v),
                                  store.klm, klm)
    return KeyframeStore(
        valid=store.valid.at[s].set(True),
        t=set_at(store.t, t),
        K_scale=set_at(store.K_scale, K_scale),
        Pose=set_at(store.Pose, Pose),
        Pos=set_at(store.Pos, Pos),
        Vel=set_at(store.Vel, Vel),
        klm=klm2,
        next_slot=(s + 1) % store.capacity,
        count=jnp.minimum(store.count + 1, store.capacity),
    )


def save_keyframes(path: str, store: KeyframeStore) -> None:
    """Serialise to npz (the analogue of the reference's kf_list.kf,
    keyframe.cpp:129-169)."""
    flat = {}
    flat["valid"] = np.asarray(store.valid)
    flat["t"] = np.asarray(store.t)
    flat["K_scale"] = np.asarray(store.K_scale)
    flat["Pose"] = np.asarray(store.Pose)
    flat["Pos"] = np.asarray(store.Pos)
    flat["Vel"] = np.asarray(store.Vel)
    flat["next_slot"] = np.asarray(store.next_slot)
    flat["count"] = np.asarray(store.count)
    for name, arr in store.klm._asdict().items():
        flat[f"klm_{name}"] = np.asarray(arr)
    np.savez_compressed(path, **flat)


def load_keyframes(path: str) -> KeyframeStore:
    z = np.load(path)
    # tolerate stores written before a KeylineMap field existed (missing
    # arrays load as their empty() default, e.g. anchored=False)
    n_kf, K = z["klm_valid"].shape
    defaults = KeylineMap.empty(K, batch_shape=(n_kf,))
    klm = KeylineMap(**{
        name: (jnp.asarray(z[f"klm_{name}"]) if f"klm_{name}" in z.files
               else getattr(defaults, name))
        for name in KeylineMap._fields})
    return KeyframeStore(
        valid=jnp.asarray(z["valid"]), t=jnp.asarray(z["t"]),
        K_scale=jnp.asarray(z["K_scale"]), Pose=jnp.asarray(z["Pose"]),
        Pos=jnp.asarray(z["Pos"]), Vel=jnp.asarray(z["Vel"]), klm=klm,
        next_slot=jnp.asarray(z["next_slot"]),
        count=jnp.asarray(z["count"]))
