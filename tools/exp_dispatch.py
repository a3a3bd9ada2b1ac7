"""Isolate why dispatches slow down after running the big VO step."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:8.3f} ms")
    return out


tiny = jnp.zeros((8, 128))
add = jax.jit(lambda x: x + 1.0)

H, W, K = 480, 752, 16384
rng = np.random.RandomState(0)
mask = jnp.asarray(rng.rand(H, W) < 0.045)
nz = jax.jit(lambda m: jnp.nonzero(m.reshape(-1), size=K, fill_value=0)[0])

timeit("phase0: tiny add (fresh process)", add, tiny)
timeit("phase0: nonzero", nz, mask)

# Now compile + run the full VO step.
from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend
from bench import synth_frames

params = REBVOParameters()
fe = VOFrontend(params)
frames = [jnp.asarray(f) for f in synth_frames(params, 2)]
state = fe.init()
state = fe.bootstrap(state, frames[0], jnp.asarray(0.0))
state, _ = fe.step(state, frames[1], jnp.asarray(0.05))
jax.block_until_ready(state)
print("-- fe.step compiled + run --")

timeit("phase1: tiny add (after step)", add, tiny)
timeit("phase1: nonzero (after step)", nz, mask)

# Drop references to the big state and see if it recovers.
del state, fe, frames
import gc
gc.collect()
print("-- state deleted --")
timeit("phase2: tiny add (state freed)", add, tiny)
timeit("phase2: nonzero (state freed)", nz, mask)
