"""Ablation sub-profiling of the two hottest kernels on TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend, MAX_IMG_VALUE
from rebvo_tpu.kernels.scale_space import build_scale_space
from rebvo_tpu.kernels.edge_detect import detect_candidates
from bench import synth_frames


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return out


def main():
    params = REBVOParameters()
    p = params
    fe = VOFrontend(params)
    cam = fe.cam
    H, W, K = p.ImageHeight, p.ImageWidth, p.KeylineMax
    frames = [jnp.asarray(f) for f in synth_frames(params, 4)]
    state = fe.init()
    state = fe.bootstrap(state, frames[0], jnp.asarray(0.0))
    for i in range(3):
        state, _ = fe.step(state, frames[i + 1], jnp.asarray(0.05 * (i + 1)))
    jax.block_until_ready(state)
    frame = frames[1]

    # Dispatch floor.
    tiny = jnp.zeros((8, 128))
    timeit("dispatch floor (tiny add)", jax.jit(lambda x: x + 1.0), tiny)

    ss = build_scale_space(frame, p.Sigma0, p.KSigma, 3)
    jax.block_until_ready(ss)

    # --- detect ablation ---
    win_s = p.DetectorPlaneFitSize

    @jax.jit
    def d_cand(ss, th):
        return detect_candidates(ss, win_s, p.DetectorPosNegThresh, th,
                                 p.DetectorDoGThresh, MAX_IMG_VALUE)
    cand = timeit("detect: candidates only", d_cand, ss, state.thresh)

    @jax.jit
    def d_nonzero(mask):
        flat = mask.reshape(-1)
        pix_idx, = jnp.nonzero(flat, size=K, fill_value=0)
        return pix_idx, jnp.sum(flat)
    nz = timeit("detect: sized nonzero", d_nonzero, cand.mask)

    @jax.jit
    def d_gather(cand, pix_idx):
        g = lambda img: img.reshape(-1)[pix_idx]
        return g(cand.theta_x), g(cand.theta_y), g(cand.n2_m), g(cand.xs), g(cand.ys)
    timeit("detect: 5 image gathers [K]", d_gather, cand, nz[0])

    @jax.jit
    def d_scatter(pix_idx):
        m = jnp.full((H * W,), -1, jnp.int32)
        return m.at[pix_idx].set(jnp.arange(K, dtype=jnp.int32),
                                 mode="drop").reshape(H, W)
    mask_img = timeit("detect: id-mask scatter [K]", d_scatter, nz[0])

    @jax.jit
    def d_chain(mask_img, pix_idx):
        rx = (pix_idx % W).astype(jnp.int32)
        ry = (pix_idx // W).astype(jnp.int32)
        tot = jnp.zeros((K,), jnp.int32)
        for dxo, dyo in ((1, 0), (0, 1), (1, 1)):
            tot += mask_img[jnp.clip(ry + dyo, 0, H - 1),
                            jnp.clip(rx + dxo, 0, W - 1)]
        return tot
    timeit("detect: 3 neighbor gathers [K]", d_chain, mask_img, nz[0])

    # --- directed matching ablation ---
    stride = p.MatchFieldStride
    steps = int(p.SearchRange / stride) + 3
    nc = 2 * steps
    new = state.klm
    old = state.klm
    field = state.field_img
    rng = np.random.RandomState(0)
    cand_t = jnp.asarray(rng.rand(K, nc).astype(np.float32) * 40 - 20)
    ux = new.gx / new.n_m
    uy = new.gy / new.n_m
    pi0x = new.x
    pi0y = new.y

    @jax.jit
    def m_ladder(cand_t, ux, uy, pi0x, pi0y, field):
        qx = jnp.floor(ux[:, None] * cand_t + pi0x[:, None] + 0.5).astype(jnp.int32)
        qy = jnp.floor(uy[:, None] * cand_t + pi0y[:, None] + 0.5).astype(jnp.int32)
        inb = (qx >= 0) & (qx < W) & (qy >= 0) & (qy < H)
        lin = jnp.clip(qy, 0, H - 1) * W + jnp.clip(qx, 0, W - 1)
        return jnp.where(inb, field.reshape(-1)[lin], -1)
    j = timeit(f"match: ladder gather [K,{nc}]", m_ladder,
               cand_t, ux, uy, pi0x, pi0y, field)

    @jax.jit
    def m_topk(j):
        hit = j >= 0
        prio = jnp.where(hit, nc - jnp.arange(nc, dtype=jnp.int32)[None, :], 0)
        return jax.lax.top_k(prio, 8)
    tk = timeit("match: top_k 8 of ladder", m_topk, j)

    @jax.jit
    def m_attr(j, sel_idx, old_gx):
        j_sel = jnp.take_along_axis(j, sel_idx, axis=-1)
        j_safe = jnp.maximum(j_sel, 0)
        attrs = jnp.stack([old_gx] * 8, axis=-1)
        return attrs[j_safe]
    timeit("match: attr row gather [K,8,8]", m_attr, j, tk[1], old.gx)

    # --- pose solver single evaluation ---
    from rebvo_tpu.kernels.pose_solver import FieldView, try_vel_rot
    fv = FieldView.from_map(field, state.klm)

    @jax.jit
    def one_eval(X, old, fv):
        return try_vel_rot(
            X, old, fv, None, zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
            width=W, height=H, max_r=jnp.asarray(40.0),
            match_thresh=p.TrackerMatchThresh,
            max_s_rho=jnp.asarray(20.0),
            match_num_min=jnp.asarray(3, jnp.int32),
            k_huber=p.ReweigthDistance)
    timeit("pose: one try_vel_rot eval", one_eval,
           jnp.zeros((6,)), state.klm, fv)

    # forward_match pieces
    @jax.jit
    def fm_scatter(old_rho, m_id_f):
        src_ok = m_id_f >= 0
        tgt = jnp.where(src_ok, m_id_f, K)
        best = jnp.full((K,), -jnp.inf, old_rho.dtype)
        return best.at[tgt].max(jnp.where(src_ok, old_rho, -jnp.inf),
                                mode="drop")
    m_id_f = jnp.asarray(rng.randint(-1, K, size=(K,)).astype(np.int32))
    timeit("fmatch: scatter-max [K]", fm_scatter, old.rho, m_id_f)


if __name__ == "__main__":
    main()
