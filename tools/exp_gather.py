"""Experiments: faster gather/compaction primitives on TPU."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 480, 752
N = H * W
K = 16384
NC = 26


def timeit(name, fn, *args, n=30):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:46s} {dt*1e3:8.3f} ms")
        return out
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


rng = np.random.RandomState(0)
table = jnp.asarray(rng.randint(-1, K, size=(N,)).astype(np.int32))
idx = jnp.asarray(rng.randint(0, N, size=(K, NC)).astype(np.int32))
mask = jnp.asarray(rng.rand(H, W) < 0.045)
vals = jnp.asarray(rng.rand(6, H, W).astype(np.float32))


# --- E0: baseline XLA gather ---
@jax.jit
def xla_gather(table, idx):
    return table[idx]

timeit("E0 xla gather [K,26] scalar", xla_gather, table, idx)


# --- E1: pallas vector-indexed gather ---
def pallas_gather_kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = table_ref[idx_ref[:]]


@jax.jit
def pallas_gather(table, idx):
    return pl.pallas_call(
        pallas_gather_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

r = timeit("E1 pallas vector gather", pallas_gather, table, idx)
if r is not None:
    ok = bool(jnp.all(r == table[idx]))
    print(f"   correct: {ok}")


# --- E1b: pallas gather via jnp.take ---
def pallas_take_kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0,
                          indices_are_sorted=False, unique_indices=False,
                          mode="clip")


@jax.jit
def pallas_take(table, idx):
    return pl.pallas_call(
        pallas_take_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

r = timeit("E1b pallas jnp.take gather", pallas_take, table, idx)
if r is not None:
    ok = bool(jnp.all(r == table[idx]))
    print(f"   correct: {ok}")


# --- E2: top_k compaction of mask -> first K indices ---
@jax.jit
def topk_compact(mask):
    flat = mask.reshape(-1)
    prio = jnp.where(flat, N - jnp.arange(N, dtype=jnp.int32), 0)
    v, i = jax.lax.top_k(prio, K)
    return jnp.where(v > 0, i, 0)

timeit("E2 top_k(360K -> 16K) compaction", topk_compact, mask)


# --- E2b: baseline sized nonzero ---
@jax.jit
def nz(mask):
    return jnp.nonzero(mask.reshape(-1), size=K, fill_value=0)[0]

timeit("E2b jnp.nonzero sized", nz, mask)


# --- E2c: cumsum + scatter compaction ---
@jax.jit
def cumsum_scatter(mask):
    flat = mask.reshape(-1)
    pos = jnp.cumsum(flat) - 1
    tgt = jnp.where(flat & (pos < K), pos, K)
    out = jnp.zeros((K,), jnp.int32)
    return out.at[tgt].max(jnp.arange(N, dtype=jnp.int32), mode="drop")

r1 = timeit("E2c cumsum+scatter compaction", cumsum_scatter, mask)
if r1 is not None:
    ok = bool(jnp.all(r1 == nz(mask)))
    print(f"   correct: {ok}")


# --- E3: MXU one-hot row compaction (rows of W, cap S) ---
S = 64

@jax.jit
def onehot_compact(mask, vals):
    m = mask.astype(jnp.float32)                       # [H, W]
    pos = jnp.cumsum(m, axis=1) - 1.0                  # [H, W]
    oh = (pos[:, :, None] == jnp.arange(S, dtype=jnp.float32)[None, None, :])
    oh = (oh & mask[:, :, None]).astype(jnp.float32)   # [H, W, S]
    v = jnp.moveaxis(vals, 0, -1)                      # [H, W, C]
    out = jnp.einsum("hws,hwc->hsc", oh, v,
                     preferred_element_type=jnp.float32)
    counts = jnp.sum(mask, axis=1)
    return out, counts

r3 = timeit("E3 one-hot matmul row compaction", onehot_compact, mask, vals)


# --- E4: pallas scatter (field paint style): K x 12 offsets scatter-min ---
kl_lin = jnp.asarray(rng.randint(0, N, size=(K, 12)).astype(np.int32))
keys = jnp.asarray(rng.randint(0, 1 << 24, size=(K, 12)).astype(np.int32))

@jax.jit
def xla_scatter_min(lin, keys):
    f = jnp.full((N,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return f.at[lin.reshape(-1)].min(keys.reshape(-1), mode="drop")

timeit("E4 xla scatter-min [K*12] -> image", xla_scatter_min, kl_lin, keys)


# --- E5: gather rows [K,8] from [K,8] table (attr style) baseline ---
attr = jnp.asarray(rng.rand(K, 8).astype(np.float32))
ridx = jnp.asarray(rng.randint(0, K, size=(K, 8)).astype(np.int32))

@jax.jit
def attr_gather(attr, ridx):
    return attr[ridx]

timeit("E5 xla attr row gather [K,8,8]", attr_gather, attr, ridx)


def pallas_attr_kernel(attr_ref, idx_ref, out_ref):
    out_ref[:] = attr_ref[idx_ref[:]]


@jax.jit
def pallas_attr(attr, ridx):
    return pl.pallas_call(
        pallas_attr_kernel,
        out_shape=jax.ShapeDtypeStruct(ridx.shape + (8,), attr.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(attr, ridx)

r = timeit("E5b pallas attr row gather", pallas_attr, attr, ridx)
if r is not None:
    ok = bool(jnp.all(r == attr[ridx]))
    print(f"   correct: {ok}")
