"""Does degradation scale with compiled-program size?"""

import subprocess
import sys

BODY = r'''
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

H, W, K, NC = 480, 752, 16384, 26
N = H * W
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
n_ops = %NOPS%
kind = "%KIND%"

if kind == "elemwise":
    # Unfusable-ish chain: alternate ops with different constants.
    def big(x):
        for i in range(n_ops):
            x = x * (1.0 + 1e-6 * i) + 1e-7 * i
            if i % 7 == 3:
                x = jnp.tanh(x)
        return x
    jax.jit(big).lower(jnp.zeros((H, W), jnp.float32)).compile()
elif kind == "gathers":
    # Many separate gather ops in one program.
    def big(t, i):
        acc = 0.0
        for k in range(n_ops):
            acc = acc + jnp.sum(t[(i + k) % N])
        return acc
    jax.jit(big).lower(table, idx).compile()
elif kind == "scatters":
    def big(i, v):
        acc = jnp.zeros((N,), jnp.float32)
        for k in range(n_ops):
            acc = acc.at[(i[:, 0] + k) % N].add(v + k)
        return acc
    jax.jit(big).lower(idx, jnp.zeros((K,), jnp.float32)).compile()
elif kind == "many_small":
    for k in range(n_ops):
        jax.jit(lambda x, k=k: x + float(k)).lower(jnp.zeros((8, 128))).compile()

after = m()
print(f"{kind:10s} n={n_ops:5d}  before={before:7.3f}  after={after:7.3f} ms")
'''

CASES = [("elemwise", 200), ("elemwise", 2000),
         ("gathers", 5), ("gathers", 25),
         ("scatters", 5), ("scatters", 25),
         ("many_small", 50)]

for kind, n in CASES:
    code = BODY.replace("%NOPS%", str(n)).replace("%KIND%", kind)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=500)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"{kind} {n}: FAILED\n{r.stderr[-300:]}")
