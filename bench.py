"""Benchmark: frames/s/chip of the full per-frame VO step on real TPU.

Prints ONE JSON line:
  {"metric": "vo_step_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 20.0}

Baseline: the reference runs as a 20 FPS realtime system on MAV-class
CPUs (BASELINE.md); the north-star target is >200 frames/s/chip.

The step includes everything the reference's three threads do per frame
on the compute path: scale space, edge detection + compaction, match
field, LM pose estimation (2+2+5 TryVelRot evaluations), forward +
directed matching, regularization, depth EKF, rescaling and pose
integration, at EuRoC 752x480 with a 16384-keyline budget.

Single-sequence steps are serially dependent (the per-frame EKF
recursion), so per-chip throughput is also measured with a batch of
independent sequences (vmap) — the deployment configuration for dataset
processing (SURVEY.md §2.9 data parallelism).
"""

import json
import time

import numpy as np


def synth_frames(params, n, seed=0):
    import jax.numpy as jnp
    H, W = params.ImageHeight, params.ImageWidth
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    out = []
    for i in range(n):
        img = 300.0 + 250.0 * np.sign(
            np.sin(xx / 17.0 + 0.3 * i) * np.sin(yy / 13.0 - 0.2 * i))
        img = (img + rng.rand(H, W) * 8.0).astype(np.float32)
        out.append(img)
    return [np.asarray(f) for f in out]


def main():
    import jax
    import jax.numpy as jnp
    from rebvo_tpu.config import REBVOParameters
    from rebvo_tpu.frontend.step import VOFrontend

    params = REBVOParameters()
    fe = VOFrontend(params)
    frames = [jnp.asarray(f) for f in synth_frames(params, 4)]

    state = fe.init()
    state = fe.bootstrap(state, frames[0], jnp.asarray(0.0))

    # Warm up / compile.
    st = state
    st, out = fe.step(st, frames[1], jnp.asarray(0.05))
    jax.block_until_ready(st)

    # Serial steps (per-sequence latency).
    n_iter = 200
    t0 = time.perf_counter()
    for i in range(n_iter):
        st, out = fe.step(st, frames[(i + 1) % 3 + 1],
                          jnp.asarray(0.05 * (i + 2)))
    jax.block_until_ready(st)
    dt_serial = (time.perf_counter() - t0) / n_iter
    fps_serial = 1.0 / dt_serial

    # Batched sequences (throughput/chip): sweep the batch size.
    fps_batched, best_B = fps_serial, 1
    stepv = jax.jit(jax.vmap(fe.step_fn))
    bootv = jax.jit(jax.vmap(fe.bootstrap_fn))
    for B in (4, 8, 16):
        try:
            states = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape).copy(),
                fe.init())
            fb = jnp.stack([frames[0]] * B)
            states = bootv(states, fb, jnp.zeros((B,)))
            f1 = jnp.stack(frames[1:3] * (B // 2))
            states, _ = stepv(states, f1, jnp.full((B,), 0.05))
            jax.block_until_ready(states)
            n_iter_b = 50
            t0 = time.perf_counter()
            for i in range(n_iter_b):
                states, _ = stepv(states, f1, jnp.full((B,), 0.05 * (i + 2)))
            jax.block_until_ready(states)
            dt_b = (time.perf_counter() - t0) / n_iter_b
            if B / dt_b > fps_batched:
                fps_batched, best_B = B / dt_b, B
        except Exception:
            break
    B = best_B

    fps = max(fps_serial, fps_batched)
    print(json.dumps({
        "metric": "vo_step_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 2),
        "detail": {
            "serial_fps": round(fps_serial, 2),
            "batched_fps": round(fps_batched, 2),
            "batch": B,
            "resolution": f"{params.ImageWidth}x{params.ImageHeight}",
            "keyline_budget": params.KeylineMax,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
