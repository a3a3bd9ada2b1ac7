"""Test: does a captured (closed-over) device array constant trigger it?"""

import subprocess
import sys

BODY = r'''
import sys, time
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
x = jnp.ones((16384,), jnp.float32)

if case == "cap0d":
    C = jnp.asarray(2.0)
    jax.jit(lambda x: x * C).lower(x).compile()
elif case == "cap3":
    C = jnp.asarray([1.0, 2.0, 3.0])
    jax.jit(lambda x: x * C[0] + C[2]).lower(x).compile()
elif case == "capbig":
    C = jnp.ones((16384,), jnp.float32)
    jax.jit(lambda x: x * C).lower(x).compile()
elif case == "arg0d":
    jax.jit(lambda x, c: x * c).lower(x, jnp.asarray(2.0)).compile()
elif case == "pyfloat":
    jax.jit(lambda x: x * 2.0 + 3.0).lower(x).compile()
elif case == "np0d":
    C = np.float32(2.0)
    jax.jit(lambda x: x * C).lower(x).compile()
elif case == "none":
    pass

after = m()
print(f"{case:10s} before={before:7.3f}  after={after:7.3f} ms")
'''

for case in ["none", "cap0d", "cap3", "capbig", "arg0d", "pyfloat", "np0d"]:
    code = BODY.replace("%CASE%", case)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"{case}: FAILED\n{r.stderr[-300:]}")
