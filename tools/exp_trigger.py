"""Find the exact op whose compilation degrades gather execution."""

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
case = "%CASE%"
fvals = jnp.zeros((K,), jnp.float32)
ridx = jnp.asarray(rng.randint(0, K, size=(K, 8)).astype(np.int32))
attr = jnp.zeros((K, 8), jnp.float32)

if case == "scatter_set":
    jax.jit(lambda i, v: jnp.zeros((N,), jnp.float32).at[i[:, 0]].set(v, mode="drop")).lower(idx, fvals).compile()
elif case == "scatter_add":
    jax.jit(lambda i, v: jnp.zeros((N,), jnp.float32).at[i[:, 0]].add(v, mode="drop")).lower(idx, fvals).compile()
elif case == "scatter_max":
    jax.jit(lambda i, v: jnp.zeros((N,), jnp.float32).at[i[:, 0]].max(v, mode="drop")).lower(idx, fvals).compile()
elif case == "row_gather":
    jax.jit(lambda a, r: a[r]).lower(attr, ridx).compile()
elif case == "take_along_axis":
    jax.jit(lambda j, s: jnp.take_along_axis(j, s, axis=-1)).lower(idx, idx[:, :8] % NC).compile()
elif case == "top_k":
    jax.jit(lambda j: jax.lax.top_k(j, 8)).lower(idx).compile()
elif case == "solve6":
    jax.jit(lambda A, b: jnp.linalg.solve(A, b)).lower(jnp.eye(6), jnp.ones((6,))).compile()
elif case == "inv6":
    jax.jit(jnp.linalg.inv).lower(jnp.eye(6)).compile()
elif case == "sort":
    jax.jit(lambda x: jnp.sort(x, axis=-1)).lower(idx).compile()
elif case == "gather2d":
    img = jnp.zeros((H, W), jnp.float32)
    yy = idx[:, :2] % H; xx = idx[:, :2] % W
    jax.jit(lambda im, y, x: im[y, x]).lower(img, yy, xx).compile()
elif case == "onehot_hist":
    jax.jit(lambda i: jnp.sum(i[:, None, 0] == jnp.arange(100)[None, :], axis=0)).lower(idx).compile()
elif case == "none":
    pass

after = m()
print(f"{case:16s} before={before:7.3f}  after={after:7.3f} ms")
'''

CASES = ["none", "scatter_set", "scatter_add", "scatter_max", "row_gather",
         "take_along_axis", "top_k", "solve6", "inv6", "sort", "gather2d",
         "onehot_hist"]

for case in CASES:
    code = BODY.replace("%CASE%", case)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"{case}: FAILED\n{r.stderr[-300:]}")
