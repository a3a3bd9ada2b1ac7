"""Minimal repro hunt: does scalar extraction (v[0]) in a vector program
trigger the global gather slowdown?"""

import subprocess
import sys

BODY = r'''
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N, K, NC = 360960, 16384, 26
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randint(-1, K, size=(N,)).astype(np.int32))
idx = jnp.asarray(rng.randint(0, N, size=(K, NC)).astype(np.int32))
gather = jax.jit(lambda t, i: jnp.sum(t[i]))

def m():
    out = gather(table, idx); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(60): out = gather(table, idx)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 60 * 1e3

before = m()
case = "%CASE%"
v = jnp.asarray([1.0, 2.0, 3.0])
x = jnp.ones((K,), jnp.float32)
R = jnp.eye(3)

if case == "extract1":
    jax.jit(lambda v, x: x * v[0]).lower(v, x).compile()
elif case == "extract3":
    jax.jit(lambda v, x: x * v[0] + x * v[1] + v[2]).lower(v, x).compile()
elif case == "extract_mat":
    jax.jit(lambda R, x: R[0, 0] * x + R[1, 2] * x).lower(R, x).compile()
elif case == "isfinite":
    jax.jit(lambda x: jnp.where(jnp.isfinite(x), x, 0.0)).lower(x).compile()
elif case == "sqrt":
    jax.jit(lambda x: jnp.sqrt(jnp.abs(x) + 1.0)).lower(x).compile()
elif case == "divide":
    jax.jit(lambda x: 1.0 / (1.0 / x + 2.0)).lower(x).compile()
elif case == "scalar0d":
    s = jnp.asarray(2.0)
    jax.jit(lambda s, x: x * s).lower(s, x).compile()
elif case == "extract_2d_img":
    img = jnp.zeros((480, 752), jnp.float32)
    jax.jit(lambda im, x: x * im[5, 7]).lower(img, x).compile()
elif case == "none":
    pass

after = m()
print(f"{case:16s} before={before:7.3f}  after={after:7.3f} ms")
'''

CASES = ["none", "extract1", "extract3", "extract_mat", "isfinite", "sqrt",
         "divide", "scalar0d", "extract_2d_img"]

for case in CASES:
    code = BODY.replace("%CASE%", case)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"{case}: FAILED\n{r.stderr[-300:]}")
