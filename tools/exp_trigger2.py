"""Incremental bisect inside detect_keylines / depth chain programs."""

import subprocess
import sys

BODY = r'''
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import jax.tree_util as jtu

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

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend, MAX_IMG_VALUE
from rebvo_tpu.kernels.scale_space import build_scale_space
from rebvo_tpu.kernels import edge_detect as ed
params = REBVOParameters()
fe = VOFrontend(params); p = params; cam = fe.cam
frame = jnp.zeros((H, W), jnp.float32)
ss_s = jax.eval_shape(lambda f: build_scale_space(f, p.Sigma0, p.KSigma, 3), frame)
ss = jtu.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), ss_s)
win_s = p.DetectorPlaneFitSize
state = fe.init()

def detect_trunc(stage):
    def fn(ss, th):
        cand = ed.detect_candidates(ss, win_s, p.DetectorPosNegThresh, th,
                                    p.DetectorDoGThresh, MAX_IMG_VALUE)
        if stage == 1: return cand
        flat = cand.mask.reshape(-1)
        (pix_idx,) = jnp.nonzero(flat, size=K, fill_value=0)
        total = jnp.sum(flat).astype(jnp.int32)
        if stage == 2: return pix_idx, total
        g = lambda img: img.reshape(-1)[pix_idx]
        gx, gy, n2 = g(cand.theta_x), g(cand.theta_y), g(cand.n2_m)
        xs, ys = g(cand.xs), g(cand.ys)
        if stage == 3: return gx, gy, n2, xs, ys
        slot = jnp.arange(K, dtype=jnp.int32)
        valid = slot < jnp.minimum(total, K)
        drop = jnp.where(valid, pix_idx, H * W)
        mask_img = jnp.full((H * W,), -1, jnp.int32)
        mask_img = mask_img.at[drop].set(slot, mode="drop").reshape(H, W)
        if stage == 4: return mask_img
        piy = (pix_idx // W).astype(jnp.int32)
        pix = (pix_idx % W).astype(jnp.int32)
        x = pix.astype(gx.dtype) + xs; y = piy.astype(gx.dtype) + ys
        rx = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        ry = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        tx = -gy; ty = gx
        n_id = jnp.full((K,), -1, jnp.int32)
        found = jnp.zeros((K,), bool)
        for dxo, dyo in ed._neighbor_offsets(tx, ty):
            nx = rx + dxo; ny = ry + dyo
            inb = (nx >= 0) & (nx < W) & (ny >= 0) & (ny < H)
            cid = jnp.where(inb, mask_img[jnp.clip(ny, 0, H - 1),
                                          jnp.clip(nx, 0, W - 1)], -1)
            take = (~found) & (cid >= 0)
            n_id = jnp.where(take, cid, n_id)
            found = found | (cid >= 0)
        if stage == 5: return n_id
        p_id = jnp.full((K,), -1, jnp.int32)
        tgt = jnp.where((n_id >= 0) & valid, n_id, K)
        p_id = p_id.at[tgt].max(slot, mode="drop")
        return n_id, p_id
    return fn

if case.startswith("detect"):
    stage = int(case[-1])
    jax.jit(detect_trunc(stage)).lower(ss, jnp.asarray(0.01)).compile()
elif case == "regularize":
    from rebvo_tpu.kernels.depth_filter import regularize_1_iter
    jax.jit(lambda m_: regularize_1_iter(m_, p.RegularizeThresh)).lower(state.klm).compile()
elif case == "ekf":
    from rebvo_tpu.kernels.depth_filter import depth_ekf
    jax.jit(lambda m_, V: depth_ekf(m_, V, cam.zfm,
        reshape_q_abs=p.ReshapeQAbsolute,
        loc_uncertainty=p.LocationUncertainty)).lower(
        state.klm, jnp.zeros((3,))).compile()
elif case == "rescale":
    from rebvo_tpu.kernels.depth_filter import estimate_rescaling_opt
    jax.jit(lambda m_: estimate_rescaling_opt(m_, apply=True)).lower(state.klm).compile()

after = m()
print(f"{case:12s} before={before:7.3f}  after={after:7.3f} ms")
'''

CASES = ["detect1", "detect2", "detect3", "detect4", "detect5", "detect6",
         "regularize", "ekf", "rescale"]

for case in CASES:
    code = BODY.replace("%CASE%", case)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=400)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"{case}: FAILED\n{r.stderr[-300:]}")
