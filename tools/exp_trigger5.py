"""Standalone minimal repro of the Y/H trigger (no rebvo imports)."""

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
K2 = 16384
a = [jnp.ones((K2,), jnp.float32) for _ in range(8)]
v = jnp.asarray([0.1, 0.2, 0.3])
zfm = 458.65

if case == "YH":
    def f(g0x, n_m0, g0y, px, p0x, py, p0y, vel):
        u_x = g0x / n_m0
        u_y = g0y / n_m0
        Y = u_x * (px - p0x) + u_y * (py - p0y)
        H = u_x * (vel[0] * zfm - vel[2] * p0x) + \
            u_y * (vel[1] * zfm - vel[2] * p0y)
        return Y, H
    jax.jit(f).lower(a[0], a[1], a[2], a[3], a[4], a[5], a[6], v).compile()
elif case == "Y_only":
    def f(g0x, n_m0, g0y, px, p0x, py, p0y):
        u_x = g0x / n_m0
        u_y = g0y / n_m0
        return u_x * (px - p0x) + u_y * (py - p0y)
    jax.jit(f).lower(*a[:7]).compile()
elif case == "H_only":
    def f(g0x, n_m0, g0y, p0x, p0y, vel):
        u_x = g0x / n_m0
        u_y = g0y / n_m0
        return u_x * (vel[0] * zfm - vel[2] * p0x) + \
            u_y * (vel[1] * zfm - vel[2] * p0y)
    jax.jit(f).lower(a[0], a[1], a[2], a[3], a[4], v).compile()
elif case == "Y_nodiv":
    def f(g0x, g0y, px, p0x, py, p0y):
        return g0x * (px - p0x) + g0y * (py - p0y)
    jax.jit(f).lower(*a[:6]).compile()
elif case == "H_nodiv":
    def f(g0x, g0y, p0x, p0y, vel):
        return g0x * (vel[0] * zfm - vel[2] * p0x) + \
            g0y * (vel[1] * zfm - vel[2] * p0y)
    jax.jit(f).lower(a[0], a[1], a[2], a[3], v).compile()
elif case == "div_mul":
    def f(g0x, n_m0, p0x, vel):
        return (g0x / n_m0) * (vel[0] * zfm - vel[2] * p0x)
    jax.jit(f).lower(a[0], a[1], a[2], v).compile()
elif case == "none":
    pass

after = m()
print(f"{case:10s} before={before:7.3f}  after={after:7.3f} ms")
'''

for case in ["none", "YH", "Y_only", "H_only", "Y_nodiv", "H_nodiv",
             "div_mul"]:
    code = BODY.replace("%CASE%", case)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"{case}: FAILED\n{r.stderr[-300:]}")
