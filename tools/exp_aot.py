"""Can AOT compile-in-subprocess + deserialize keep the parent fast?

Child: compiles the ekf program (trigger), serializes executable.
Parent: measures gather; deserializes + runs ekf; measures gather again.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CHILD = r'''
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental.serialize_executable import serialize
from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend

params = REBVOParameters()
fe = VOFrontend(params)
state = fe.init()
from rebvo_tpu.kernels.depth_filter import depth_ekf
fn = jax.jit(lambda m_, V: depth_ekf(m_, V, fe.cam.zfm,
    reshape_q_abs=params.ReshapeQAbsolute,
    loc_uncertainty=params.LocationUncertainty))
compiled = fn.lower(state.klm, jnp.zeros((3,))).compile()
blob, in_tree, out_tree = serialize(compiled)
with open("/tmp/ekf_exe.bin", "wb") as f:
    f.write(blob)
print("serialized", len(blob))
'''

r = subprocess.run([sys.executable, "-c", CHILD], capture_output=True,
                   text=True, timeout=300)
print("child:", r.stdout.strip()[-200:], r.stderr.strip()[-300:] if r.returncode else "")

import jax
import jax.numpy as jnp
import numpy as np

N, K, NC = 360960, 16384, 26
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randint(-1, K, size=(N,)).astype(np.int32))
idx = jnp.asarray(rng.randint(0, N, size=(K, NC)).astype(np.int32))
gather = jax.jit(lambda t, i: jnp.sum(t[i]))


def m(tag):
    out = gather(table, idx); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(60):
        out = gather(table, idx)
    jax.block_until_ready(out)
    print(f"{tag:34s} {(time.perf_counter()-t0)/60*1e3:7.3f} ms")


m("gather before deserialize")

from jax.experimental.serialize_executable import deserialize_and_load
from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend
from rebvo_tpu.kernels.depth_filter import depth_ekf

params = REBVOParameters()
fe = VOFrontend(params)
state = fe.init()
fn = jax.jit(lambda m_, V: depth_ekf(m_, V, fe.cam.zfm,
    reshape_q_abs=params.ReshapeQAbsolute,
    loc_uncertainty=params.LocationUncertainty))
traced = fn.lower(state.klm, jnp.zeros((3,)))
import jax.tree_util as jtu
with open("/tmp/ekf_exe.bin", "rb") as f:
    blob = f.read()
# need in_tree/out_tree: recompute treedefs from a lowering
compiled = deserialize_and_load(
    blob, traced._lowering_treedefs()
    if hasattr(traced, "_lowering_treedefs") else None)
print("deserialized ok")
out = compiled(state.klm, jnp.zeros((3,)))
jax.block_until_ready(out)
m("gather after deserialized ekf run")
