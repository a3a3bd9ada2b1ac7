"""CLI: offline bundle adjustment over a saved keyframe list.

The backend counterpart of the reference's offline toolchain around
`kf_list.kf` (app/kf_visualizer consumes it read-only; the reference
never optimizes it — its pose_graph is a measurement log only,
pose_graph.h:88). Here the keyframe list is re-matched into an
edge-landmark BA problem and solved with the Schur-complement
Gauss-Newton backend, optionally sharded over a device mesh.

Examples:
    python -m rebvo_tpu.apps.run_ba kf_list.npz --out kf_list_opt.npz
    python -m rebvo_tpu.apps.run_ba kf_list.npz --shards 8 --cpu
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kf_list", help="keyframe npz (VOSystem.TakeSnapshot)")
    ap.add_argument("--out", default=None,
                    help="optimized keyframe npz (default: <in>_opt.npz)")
    ap.add_argument("--trajectory", default=None,
                    help="also write optimized poses as a TUM-format file")
    ap.add_argument("--config", help="REBVO-format config file")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=4,
                    help="re-match/solve rounds: after each solve the "
                         "problem is rebuilt from the improved poses")
    ap.add_argument("--field-radius", type=int, default=8,
                    help="match-field search radius in pixels")
    ap.add_argument("--window", type=int, default=2,
                    help="match each keyframe into this many followers")
    ap.add_argument("--huber-k", type=float, default=3.0)
    ap.add_argument("--mutual-px", type=float, default=0.0,
                    help="round-trip back-projection cull tolerance "
                         "(px; 0 = off)")
    ap.add_argument("--revisit-dist", type=float, default=0.0,
                    help="also associate keyframe pairs whose positions "
                         "are within this distance (loop-closure pairs)")
    ap.add_argument("--revisit-min-gap", type=int, default=8)
    ap.add_argument("--landmark-stride", type=int, default=1,
                    help="thin the landmark set to every Nth keyline")
    ap.add_argument("--shards", type=int, default=0,
                    help="shard landmarks over an n-device mesh "
                         "(0 = single device)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rebvo_tpu.backend.ba import (ba_solve, ba_solve_sharded,
                                      partition_problem,
                                      problem_from_keyframes)
    from rebvo_tpu.backend.keyframe import load_keyframes, save_keyframes
    from rebvo_tpu.config import REBVOParameters, load_config
    from rebvo_tpu.core.geometry import CameraModel

    params = load_config(args.config) if args.config else REBVOParameters()
    cam = CameraModel.from_params(params)

    store = load_keyframes(args.kf_list)
    n_valid = int(jnp.sum(store.valid))
    if n_valid < 2:
        print(json.dumps({"error": "need >= 2 keyframes", "got": n_valid}))
        return 1

    R2, p2 = store.Pose, store.Pos
    zfm = jnp.asarray(cam.zfm, p2.dtype)
    n_obs = 0
    all_costs = []
    for _ in range(max(args.rounds, 1)):
        prob = problem_from_keyframes(
            store._replace(Pose=R2, Pos=p2), cam.zfm,
            width=cam.width, height=cam.height,
            cx=float(cam.cx), cy=float(cam.cy),
            match_thresh=params.TrackerMatchThresh,
            field_radius=args.field_radius, window=args.window,
            mutual_px=args.mutual_px,
            revisit_dist=args.revisit_dist,
            revisit_min_gap=args.revisit_min_gap,
            landmark_stride=args.landmark_stride)
        n_obs = int(jnp.sum(prob.ovalid))
        if args.shards > 1:
            from rebvo_tpu.parallel.mesh import data_mesh
            mesh = data_mesh(args.shards)
            prob_s = partition_problem(prob, args.shards)
            R2, p2, rho2, costs = ba_solve_sharded(
                R2, p2, prob_s, zfm, mesh, iters=args.iters,
                huber_k=args.huber_k)
            # rho2 is shard-partitioned over the padded landmark axis;
            # the store update below only needs poses.
        else:
            R2, p2, rho2, costs = ba_solve(
                R2, p2, prob, zfm, iters=args.iters, huber_k=args.huber_k)
        all_costs.append(np.asarray(costs))
    costs = np.concatenate(all_costs)

    store2 = store._replace(Pose=R2, Pos=p2)
    out = args.out or os.path.splitext(args.kf_list)[0] + "_opt.npz"
    save_keyframes(out, store2)

    if args.trajectory:
        from rebvo_tpu.core.geometry import rotation_to_quaternion
        from rebvo_tpu.io.trajectory import write_tum
        live = np.asarray(store2.valid)
        ts = np.asarray(store2.t)[live]
        pos = np.asarray(p2)[live]
        quat = np.stack([np.asarray(rotation_to_quaternion(R2[i]))
                         for i in np.nonzero(live)[0]])
        write_tum(args.trajectory, ts, pos, quat)

    costs = np.asarray(costs)
    print(json.dumps({
        "keyframes": n_valid,
        "landmarks": int(jnp.sum(prob.lvalid)),
        "observations": n_obs,
        "cost_initial": float(costs[0]),
        "cost_final": float(costs[-1]),
        "shards": max(args.shards, 1),
        "out": out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
