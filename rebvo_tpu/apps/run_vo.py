"""CLI: run VO/VIO on one sequence (the reference's rebvorun,
app/rebvorun/main.cpp:58-140). `--interactive` binds the reference's
stdin command loop (q/s/p/r/k/f/a, main.cpp:92-140) to the VOSystem
API.

Examples:
    # EuRoC directory with the shipped-style config
    python -m rebvo_tpu.apps.run_vo --config GlobalConfig_EuRoC \
        --euroc /data/MH_01_easy/mav0 --out-dir ./out

    # Visual-inertial + stereo
    python -m rebvo_tpu.apps.run_vo --euroc /data/MH_01_easy/mav0 \
        --imu --stereo --out-dir ./out

    # Synthetic smoke run (no dataset needed)
    python -m rebvo_tpu.apps.run_vo --synthetic 40 --out-dir ./out
"""

from __future__ import annotations

import argparse
import os
import sys
import time


_HELP_KEYS = """Interactive commands (reference app/rebvorun/main.cpp:45-56):
  q: quit                        s: save keyframes + pose log, then quit
  p: snapshot current frame      r: reset depth/trajectory
  k: toggle keyframe pushes      f: toggle frame-by-frame (and advance)
  a: advance one frame (frame-by-frame mode)"""


def interactive_loop(params, seq, out_dir: str,
                     max_frames: int = 0):
    """The reference rebvorun's stdin command loop
    (app/rebvorun/main.cpp:92-140) bound to the VOSystem API. Runs the
    sequence on a worker loop; stdin commands are applied between
    frames. Returns the VOSystem."""
    import queue
    import threading

    import numpy as np

    from rebvo_tpu.system import VOSystem

    sys_ = VOSystem(params)
    cmds: "queue.Queue[str]" = queue.Queue()

    def reader():
        for line in iter(sys.stdin.readline, ""):
            for ch in line.strip():
                cmds.put(ch)

    threading.Thread(target=reader, daemon=True).start()
    print(_HELP_KEYS, flush=True)

    frame_by_frame = False
    kf_enabled = True
    savekf = False
    quit_ = False
    n_done = 0
    for item in seq:
        # frame-by-frame gate (rebvo_first_t.cpp:154-159): block until a
        # command arrives; 'a'/'f' advance
        while True:
            try:
                c = cmds.get(block=frame_by_frame, timeout=0.2)
            except queue.Empty:
                break
            if c == "q":
                quit_ = True
            elif c == "s":
                savekf = True
                quit_ = True
            elif c == "p":
                from PIL import Image
                t, frame = item[0], item[1]
                g = np.clip(np.asarray(frame) / 3.0, 0, 255).astype(
                    np.uint8)
                snap = os.path.join(out_dir, f"snapshot_{n_done:06d}.png")
                Image.fromarray(g, mode="L").save(snap)
                print(f"snapshot -> {snap}", flush=True)
            elif c == "r":
                sys_.Reset()
                print("reset requested", flush=True)
            elif c == "k":
                kf_enabled = not kf_enabled
                print(f"keyframe pushes {'on' if kf_enabled else 'off'}",
                      flush=True)
            elif c == "f":
                frame_by_frame = not frame_by_frame
                break
            elif c == "a":
                break
            else:
                print(_HELP_KEYS, flush=True)
            if quit_ or not frame_by_frame:
                break
        if quit_:
            break
        if len(item) == 4:
            t, frame, win, pair = item
        else:
            t, frame, win = item
            pair = None
        sys_.kf_push_enabled = kf_enabled
        sys_.process_frame(frame, t, win, frame_pair=pair)
        n_done += 1
        if n_done % 50 == 0:
            print(f"frame {n_done}", flush=True)
        if max_frames and n_done >= max_frames:
            break
    if savekf:
        kf_path = os.path.join(out_dir, "kf_list.npz")
        poses_path = os.path.join(out_dir, "poses_list.npz")
        sys_.TakeSnapshot(kf_path, poses_path)
        print(f"saved KF -> {kf_path}; PG -> {poses_path}", flush=True)
    sys_.save_outputs(out_dir)
    print(f"processed {n_done} frames (interactive)", flush=True)
    return sys_


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="REBVO-format config file")
    ap.add_argument("--euroc", help="EuRoC mav0 directory")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a dataset")
    ap.add_argument("--imu", action="store_true", help="visual-inertial mode")
    ap.add_argument("--stereo", action="store_true",
                    help="stereo mode (StereoAvaiable): loads the cam1 "
                         "stream and fuses stereo depth per frame")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--chunk", type=int, default=0,
                    help="offline replay: advance N frames per device "
                         "dispatch (lax.scan) — amortises host dispatch "
                         "overhead; vision-only mono path")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--save-video", choices=["raw", "mjpeg"],
                    help="buffer the encoded input stream to "
                         "<out-dir>/video.rvv (the reference's VideoSave "
                         "path, rebvo_third_t.cpp:249-256)")
    ap.add_argument("--kf-every", type=int, default=0,
                    help="push a keyframe (current edge map + pose) every "
                         "N frames into a device-resident store, saved at "
                         "exit as <out-dir>/kf_list.npz — the offline-BA "
                         "input (reference 's' key, app/rebvorun/"
                         "main.cpp:132-136). Device-side: no mid-run D2H.")
    ap.add_argument("--save-kf", default=None,
                    help="keyframe store output path "
                         "(default <out-dir>/kf_list.npz)")
    ap.add_argument("--interactive", action="store_true",
                    help="reference rebvorun stdin command loop "
                         "(q/s/p/r/k/f/a, app/rebvorun/main.cpp:92-140) "
                         "driving the VOSystem API")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: repeat runs skip the 20-40 s compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("REBVO_COMPILE_CACHE",
                                     "/tmp/rebvo_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from rebvo_tpu.config import REBVOParameters, load_config
    from rebvo_tpu.frontend.step import VOFrontend
    from rebvo_tpu.io.dataset import imu_window_size, read_cam_imu_se3
    from rebvo_tpu.io.logger import RunLogger
    from rebvo_tpu.io.undistort import apply_undistort, build_undistort_map

    params = load_config(args.config) if args.config else REBVOParameters()
    if args.imu:
        params = params.replace(ImuMode=2)
    if args.stereo:
        params = params.replace(StereoAvaiable=1)

    os.makedirs(args.out_dir, exist_ok=True)

    stereo = bool(params.StereoAvaiable)
    if args.synthetic:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from bench import synth_frames
        n = args.synthetic
        frames = synth_frames(params, min(n, 8))
        seq = [(i / params.config_fps, frames[i % len(frames)], None)
               for i in range(n)]
        stereo = False
    else:
        from rebvo_tpu.io.dataset import DatasetSequence
        if args.euroc:
            seq = DatasetSequence.euroc(
                args.euroc, with_imu=bool(params.ImuMode), stereo=stereo,
                window_size=imu_window_size(params),
                time_desinc=params.TimeDesinc)
        else:
            seq = DatasetSequence.from_params(params)
        stereo = seq.stereo

    # size the device-resident nav-log ring to the run (one end-of-run
    # fetch; per-frame host syncs are catastrophic on this runtime —
    # see io/logger.py RunLogger.from_device_log)
    try:
        n_total = len(seq)
        if args.max_frames:
            n_total = min(n_total, args.max_frames)
        params = params.replace(
            NavLogCap=max(params.NavLogCap, n_total + 8))
    except TypeError:
        pass

    if args.interactive:
        interactive_loop(params, seq, args.out_dir,
                         max_frames=args.max_frames)
        return

    fe = VOFrontend(params)
    umap = build_undistort_map(fe.cam) if params.useUndistort else None
    umap_pair = (build_undistort_map(fe.cam_pair)
                 if stereo and params.useUndistort else None)

    # Camera->IMU extrinsics (the reference applies them inside the IMU
    # integration, imugrabber.cpp:135-160,217-250).
    R_c2i = T_c2i = None
    if params.ImuMode and params.CamImuSE3File:
        R_np, T_np = read_cam_imu_se3(params.CamImuSE3File)
        R_c2i = jnp.asarray(R_np, jnp.float32)
        T_c2i = jnp.asarray(T_np, jnp.float32)

    venc = vout = None
    if args.save_video:
        from rebvo_tpu.io.video import (VIDEO_ENCODER_TYPE_MJPEG,
                                        VIDEO_ENCODER_TYPE_RAW,
                                        VideoStreamWriter, make_encoder)
        etype = (VIDEO_ENCODER_TYPE_MJPEG if args.save_video == "mjpeg"
                 else VIDEO_ENCODER_TYPE_RAW)
        venc = make_encoder(etype, params.ImageWidth, params.ImageHeight)
        vout = VideoStreamWriter(os.path.join(args.out_dir, "video.rvv"),
                                 params.ImageWidth, params.ImageHeight)

    state = fe.init()
    kf_store = kf_push = None
    if args.kf_every > 0:
        from rebvo_tpu.backend.keyframe import (KeyframeStore,
                                                push_keyframe,
                                                save_keyframes)
        try:
            cap = len(seq) // args.kf_every + 2
        except TypeError:
            cap = 512 // args.kf_every + 2
        if args.max_frames:
            cap = min(cap, args.max_frames // args.kf_every + 2)
        kf_store = KeyframeStore.empty(cap, params.KeylineMax)

        # depths stay in the map gauge: measured on the parity scenes,
        # the as-captured (rho, Pose, Pos) store reprojects 6.6x more
        # consistently than a cumulative-Kp-converted one (the Kp ratio
        # does not track the realised velocity gauge closely enough to
        # transport depths across keyframes)
        kf_push = jax.jit(push_keyframe, donate_argnums=0)
    chunk_buf = ([] if args.chunk > 1 and not stereo and not params.ImuMode
                 and kf_push is None else None)
    n_done = 0
    t_start = time.perf_counter()
    for item in seq:
        if stereo:
            t, frame, win, pair = item
            # pair is None when the cam1 stream dropped this frame
            # (dataset pairing gap threshold) — run the frame mono.
            if pair is not None:
                pair = jnp.asarray(pair)
                if umap_pair is not None:
                    pair = apply_undistort(umap_pair, pair)
        else:
            t, frame, win = item
            pair = None
        frame = jnp.asarray(frame)
        if umap is not None:
            frame = apply_undistort(umap, frame)
        if n_done == 0:
            state = fe.bootstrap(state, frame, jnp.asarray(t), pair)
        elif chunk_buf is not None:
            chunk_buf.append((frame, t))
            if len(chunk_buf) == args.chunk:
                fs = jnp.stack([f for f, _ in chunk_buf])
                ts = jnp.asarray([tt for _, tt in chunk_buf], jnp.float32)
                state, _ = fe.step_scan(state, fs, ts)
                chunk_buf.clear()
        elif params.ImuMode and win is not None:
            # donated step: the previous state's device buffers are
            # recycled for the new state (serial-latency path)
            state, out = fe.step_imu_donated(state, frame, jnp.asarray(t),
                                             win, R_c2i, T_c2i, pair)
        else:
            state, out = fe.step_donated(state, frame, jnp.asarray(t), pair)
        if (kf_push is not None and n_done > 0
                and n_done % args.kf_every == 0):
            kf_store = kf_push(kf_store, state.klm, state.t,
                               state.K_scale, state.Pose, state.Pos,
                               state.Vel)
        if venc is not None:
            venc.push_frame(np.asarray(frame))
            data = venc.pop_frame()
            if data is not None:
                vout.write(t, data, venc.encoder_type)
        n_done += 1
        if n_done % 50 == 0:
            # progress WITHOUT touching device buffers: any mid-run D2H
            # fetch stalls and degrades this runtime (io/logger.py)
            rate = n_done / (time.perf_counter() - t_start)
            print(f"frame {n_done} ({rate:.0f} fps wall)", flush=True)
        if args.max_frames and n_done >= args.max_frames:
            break

    if chunk_buf:
        # flush the partial tail chunk one frame at a time
        for f, tt in chunk_buf:
            state, _ = fe.step_donated(state, f, jnp.asarray(tt))
    import jax
    jax.block_until_ready(state)
    wall = time.perf_counter() - t_start
    if vout is not None:
        vout.close()
    if kf_store is not None:
        kf_path = args.save_kf or os.path.join(args.out_dir, "kf_list.npz")
        save_keyframes(kf_path, kf_store)
        n_kf = int(kf_store.count)
        cap = int(kf_store.valid.shape[0])
        if n_kf >= cap:
            # ring store: pushes beyond capacity overwrite the EARLIEST
            # keyframes (advisor r4: silent truncation of the offline-BA
            # input when the sequence length was unknown up front)
            print(f"WARNING: keyframe ring filled (capacity {cap}); "
                  f"earliest keyframes were overwritten")
        print(f"saved {min(n_kf, cap)} keyframes -> {kf_path}")
    # ONE bulk fetch of the whole run's nav log
    logger = RunLogger.from_device_log(state.navlog, state.navlog_n)
    tray = os.path.join(args.out_dir, params.TrayFile)
    logger.write_trajectory(tray)
    logger.write_mfile(os.path.join(args.out_dir, params.LogFile))
    r = logger.rows[-1] if logger.rows else {}
    print(f"processed {n_done} frames in {wall:.1f}s "
          f"({n_done / wall:.1f} fps); kl={r.get('kl_num')} "
          f"match={r.get('klm_num')}; trajectory -> {tray}")


if __name__ == "__main__":
    main()
