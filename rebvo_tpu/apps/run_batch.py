"""CLI: batched multi-sequence VO over the device mesh (BASELINE.json
config 5 shape: all sequences processed as one sharded computation).

Each mesh device carries one (or more) sequences; the vmapped step runs
them lock-step. Sequences are synthetic (default) or EuRoC directories.

    python -m rebvo_tpu.apps.run_batch --synthetic 20 --batch 8 --cpu
    python -m rebvo_tpu.apps.run_batch --euroc dir1 dir2 ... --out-dir out
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--euroc", nargs="*", default=[])
    ap.add_argument("--synthetic", type=int, default=0,
                    help="frames per synthetic sequence")
    ap.add_argument("--batch", type=int, default=0,
                    help="number of sequences (default: #devices)")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rebvo_tpu.config import REBVOParameters
    from rebvo_tpu.frontend.step import VOFrontend
    from rebvo_tpu.io.trajectory import write_tum
    from rebvo_tpu.core.geometry import rotation_to_quaternion
    from rebvo_tpu.parallel.mesh import data_mesh, shard_batch

    n_dev = args.devices or len(jax.devices())
    B = args.batch or n_dev
    params = REBVOParameters()
    # largest device count that divides the batch (shard_map needs the
    # batch axis to split evenly; uneven batches waste the remainder)
    n_mesh = max(d for d in range(1, min(n_dev, B) + 1) if B % d == 0)
    mesh = data_mesh(n_mesh)

    # --- assemble B sequences of frames
    if args.euroc:
        from rebvo_tpu.io.dataset import DatasetSequence
        seqs = [DatasetSequence.euroc(d, with_imu=False) for d in args.euroc]
        B = len(seqs)
        n_frames = min(len(s) for s in seqs)
        def frame_at(b, i):
            rec = seqs[b].records[i]
            from rebvo_tpu.io.dataset import load_frame
            return rec.t, load_frame(rec.path)
    else:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from bench import synth_frames
        n_frames = args.synthetic or 10
        pool = {b: synth_frames(params, 4, seed=b) for b in range(B)}
        def frame_at(b, i):
            return i / params.config_fps, pool[b][i % 4]

    from rebvo_tpu.parallel.mesh import shard_sequences
    fe = VOFrontend(params)
    # shard_map, not GSPMD propagation: independent sequences must not
    # pay collective overhead (see mesh.shard_sequences)
    stepv = shard_sequences(fe.step_fn, mesh)
    bootv = shard_sequences(fe.bootstrap_fn, mesh)

    states = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape).copy(), fe.init())
    states = shard_batch(states, mesh)

    t0 = time.perf_counter()
    rows = []
    for i in range(n_frames):
        fb = np.stack([frame_at(b, i)[1] for b in range(B)])
        tb = np.asarray([frame_at(b, i)[0] for b in range(B)], np.float32)
        fb = shard_batch(jnp.asarray(fb), mesh)
        tb = shard_batch(jnp.asarray(tb), mesh)
        if i == 0:
            states = bootv(states, fb, tb)
        else:
            states, outs = stepv(states, fb, tb)
            rows.append((np.asarray(outs.nav.t), np.asarray(outs.nav.Pos),
                         np.asarray(outs.nav.Pose)))
    jax.block_until_ready(states)
    wall = time.perf_counter() - t0

    os.makedirs(args.out_dir, exist_ok=True)
    for b in range(B):
        ts = [r[0][b] for r in rows]
        pos = np.stack([r[1][b] for r in rows])
        quat = np.stack([
            np.asarray(rotation_to_quaternion(jnp.asarray(r[2][b])))
            for r in rows])
        write_tum(os.path.join(args.out_dir, f"tray_seq{b}.txt"), ts, pos,
                  quat)

    fps = B * (n_frames - 1) / wall
    print(json.dumps({"sequences": B, "frames_each": n_frames,
                      "wall_s": round(wall, 2),
                      "aggregate_fps": round(fps, 2),
                      "devices": mesh.devices.size}))


if __name__ == "__main__":
    main()
