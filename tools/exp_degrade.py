"""Does the degradation slow device execution, or only dispatch?
Also rules out identical-arg memoization by varying inputs."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

H, W, K, NC = 480, 752, 16384, 26
N = H * W
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randint(-1, K, size=(N,)).astype(np.int32))
idxs = [jnp.asarray(rng.randint(0, N, size=(K, NC)).astype(np.int32))
        for _ in range(4)]

gather = jax.jit(lambda t, i: jnp.sum(t[i]))
mask = jnp.asarray(rng.rand(H, W) < 0.045)
nz = jax.jit(lambda m: jnp.nonzero(m.reshape(-1), size=K, fill_value=0)[0])
masks = [jnp.asarray(rng.rand(H, W) < 0.045) for _ in range(4)]


def measure(tag):
    # identical args
    out = gather(table, idxs[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(100):
        out = gather(table, idxs[0])
    jax.block_until_ready(out)
    same = (time.perf_counter() - t0) / 100 * 1e3
    # varying args
    t0 = time.perf_counter()
    for i in range(100):
        out = gather(table, idxs[i % 4])
    jax.block_until_ready(out)
    vary = (time.perf_counter() - t0) / 100 * 1e3
    # nonzero varying
    out = nz(masks[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(60):
        out = nz(masks[i % 4])
    jax.block_until_ready(out)
    nzv = (time.perf_counter() - t0) / 60 * 1e3
    print(f"{tag:28s} gather same={same:7.3f}  vary={vary:7.3f}  "
          f"nonzero vary={nzv:7.3f} ms")


measure("fresh")

# Compile the detect program (the degradation trigger).
from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend, MAX_IMG_VALUE
from rebvo_tpu.kernels.scale_space import build_scale_space
from rebvo_tpu.kernels.edge_detect import detect_keylines
import jax.tree_util as jtu

params = REBVOParameters()
fe = VOFrontend(params)
p, cam = params, fe.cam
frame = jnp.zeros((H, W), jnp.float32)
ss_s = jax.eval_shape(lambda f: build_scale_space(f, p.Sigma0, p.KSigma, 3),
                      frame)
ss = jtu.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), ss_s)
jax.jit(lambda ss, th: detect_keylines(
    ss, th, K=K, kl_max=p.MaxPoints, win_s=p.DetectorPlaneFitSize,
    per_hist=p.DetectorPosNegThresh, dog_thresh=p.DetectorDoGThresh,
    max_img_value=MAX_IMG_VALUE, cx=cam.cx, cy=cam.cy)).lower(
    ss, jnp.asarray(0.01)).compile()
print("-- detect compiled --")

measure("after detect compile")
