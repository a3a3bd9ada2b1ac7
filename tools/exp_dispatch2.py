"""Narrow the dispatch-degradation trigger: compile vs run vs memory."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:56s} {dt*1e3:8.3f} ms")
    return out


tiny = jnp.zeros((8, 128))
add = jax.jit(lambda x: x + 1.0)
timeit("t0 tiny add (fresh)", add, tiny)

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend
from bench import synth_frames

params = REBVOParameters()
fe = VOFrontend(params)
frames = [jnp.asarray(f) for f in synth_frames(params, 2)]
state = fe.init()

# A: compile only (trace+compile, no execute).
lowered = fe.step_fn
compiled = jax.jit(fe.step_fn).lower(state, frames[1], jnp.asarray(0.05)).compile()
print("-- step compiled (not run) --")
timeit("t1 tiny add (after compile only)", add, tiny)

# B: run bootstrap (medium program).
state = fe.bootstrap(state, frames[0], jnp.asarray(0.0))
jax.block_until_ready(state)
print("-- bootstrap run --")
timeit("t2 tiny add (after bootstrap run)", add, tiny)

# C: run the full step.
state2, _ = fe.step(state, frames[1], jnp.asarray(0.05))
jax.block_until_ready(state2)
print("-- step run --")
timeit("t3 tiny add (after step run)", add, tiny)

# D: clear executable caches.
jax.clear_caches()
print("-- jax.clear_caches() --")
timeit("t4 tiny add (after clear_caches)", jax.jit(lambda x: x + 1.0), tiny)

# E: memory stats if available.
try:
    ms = jax.devices()[0].memory_stats()
    print({k: v for k, v in ms.items() if "bytes" in k})
except Exception as e:
    print("memory_stats unavailable:", e)
