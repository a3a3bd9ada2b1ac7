"""Golden head-to-head parity harness against the built reference binary.

The north-star metric is "match the reference trajectory within its ATE
bound" — this app measures it directly:

  1. renders synthetic sequences (multi-depth billboard scenes with real
     occlusions, `rebvo_tpu.io.render`) and writes them as a
     DataSetCam-format dataset (PNG frames + `timestamp_ns,filename`
     list — the reference's deterministic replay path,
     reference src/VideoLib/datasetcam.cpp:172-191: frames are pulled at
     pipeline speed with CSV timestamps, no wall-clock dependence);
  2. generates a single GlobalConfig (config.dump_config emits every
     mandatory key of reference src/rebvo/rebvo.cpp:53-221) consumed by
     BOTH the reference `rebvorun` binary and this repo's run_vo;
  3. runs the reference binary (stdin fed a keystroke trickle so its
     interactive loop, reference app/rebvorun/main.cpp:92-125, re-checks
     Running() and exits at dataset end) and collects its TUM-format
     `rebvo_tray.txt` (reference src/rebvo/rebvo_third_t.cpp:311);
  4. runs this repo's VO on the same frames + config;
  5. reports ATE(repo vs GT), ATE(ref vs GT) and ATE(repo vs ref) per
     sequence — Umeyama Sim(3) alignment, since monocular VO has gauge
     freedom — into PARITY_rNN.json.

The reference binary links libv4l2, absent in this container; build
`native/libv4l2.so.0` (make -C native) and this app points
LD_LIBRARY_PATH at it — the stub is never called under DataSetCam.

Usage:
    python -m rebvo_tpu.apps.parity --out-dir /tmp/rebvo_parity \
        --json PARITY_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

REF_BINARY = "/root/reference/app/rebvorun/rebvorun"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# camera used for all parity scenes (distortion-free so UseUndistort=0
# on both sides and the PNG pixels are the whole story)
W, H, ZF, CX, CY = 752, 480, 400.0, 376.0, 240.0
FPS = 20.0


def _traj_eval(kind: str, u: np.ndarray):
    """Smooth camera paths with parallax + gentle rotation, evaluated at
    path parameter u in [0,1]; returns (pos [n,3], yaw [n], pitch [n])."""
    u = np.asarray(u, np.float64)
    pos = np.zeros(u.shape + (3,))
    yaw = np.zeros(u.shape)
    pitch = np.zeros(u.shape)
    if kind == "lateral_arc":
        pos[..., 0] = 0.45 * np.sin(np.pi * u)
        pos[..., 1] = 0.12 * np.sin(2 * np.pi * u)
        pos[..., 2] = 0.25 * u
        yaw = 0.10 * np.sin(np.pi * u)
    elif kind == "dolly":
        pos[..., 2] = 0.9 * u
        pos[..., 0] = 0.15 * np.sin(2 * np.pi * u)
        pitch = 0.05 * np.sin(2 * np.pi * u)
    elif kind == "loop":
        pos[..., 0] = 0.35 * np.sin(2 * np.pi * u)
        pos[..., 1] = 0.18 * (1 - np.cos(2 * np.pi * u))
        pos[..., 2] = 0.30 * np.sin(np.pi * u)
        yaw = 0.08 * np.sin(2 * np.pi * u)
    else:
        raise ValueError(kind)
    return pos, yaw, pitch


def _build_rots(yaw: np.ndarray, pitch: np.ndarray) -> np.ndarray:
    """World-from-camera rotations Ry(yaw) @ Rx(pitch), vectorized."""
    n = len(yaw)
    rot = np.empty((n, 3, 3))
    for i in range(n):
        cy_, sy = np.cos(yaw[i]), np.sin(yaw[i])
        cp, sp = np.cos(pitch[i]), np.sin(pitch[i])
        Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        rot[i] = Ry @ Rx
    return rot


def _traj(kind: str, n: int):
    """Per-frame camera path; returns (positions [n,3] world, rotations
    [n,3,3] world-from-camera)."""
    pos, yaw, pitch = _traj_eval(kind, np.linspace(0.0, 1.0, n))
    return pos, _build_rots(yaw, pitch)


# ---------------------------------------------------------------------------
# Visual-inertial sequences: same scenes/paths, physically-consistent IMU
# (VERDICT r3 #2). The reference consumes the IMU as a EuRoC-format CSV
# (ImuMode=2, imugrabber.cpp:80: `t,gx,gy,gz,ax,ay,az`); the repo reads
# the identical file through its config (io/dataset.read_euroc_imu).
# ---------------------------------------------------------------------------

VI_HOLD = 0.12      # fraction of the duration held stationary at start:
                    # both systems average the early gyro as the initial
                    # bias (InitBias/InitBiasFrameNum,
                    # rebvo_second_t.cpp:184-201)
VI_T0 = 1.0         # cam+IMU time offset (s): the reference's first-frame
                    # IMU window is (0, t_frame0] (rebvo_first_t.cpp:89,
                    # 294-303) — a zero first cam timestamp would make it
                    # empty and spin the grab loop forever
IMU_HZ = 200.0
G_W = np.asarray([0.0, 9.8, 0.0])     # gravity "down" = +y (image down)


def _vi_pose_at(base_kind: str, t_sec: np.ndarray, T_end: float):
    """Camera pose at arbitrary times for the VI variants: the base path
    time-warped with a C1 smoothstep (zero velocity at both ends, with a
    stationary hold for bias init) plus a small high-frequency position/
    yaw dither that gives the accelerometer the excitation monocular
    scale observability needs (MAV-style hover jitter)."""
    t_sec = np.asarray(t_sec, np.float64)
    tau = np.clip(t_sec / T_end, 0.0, 1.0)
    s = np.clip((tau - VI_HOLD) / (1.0 - VI_HOLD), 0.0, 1.0)
    u = s * s * (3.0 - 2.0 * s)
    pos, yaw, pitch = _traj_eval(base_kind, u)
    # Position dither runs from t=0 (short ramp-in only): it leaves the
    # gyro untouched, so the stationary-gyro bias init still works, and
    # it primes the visual-acceleration windows BEFORE the scale filter
    # turns on (frame 4+InitBiasFrameNum) — turning the filter on with
    # zero excitation invites the alpha/g degenerate family
    # (a_s + g = a_v tan(a) has exact solutions for any alpha) and both
    # estimators can settle into a wrong-g equilibrium.
    tp = np.maximum(t_sec, 0.0)
    act = np.clip(tp / 0.4, 0.0, 1.0)
    act = act * act * (3.0 - 2.0 * act)
    pos[..., 0] += 0.05 * np.sin(2 * np.pi * 1.3 * tp) * act
    pos[..., 1] += 0.035 * np.sin(2 * np.pi * 0.9 * tp + 1.0) * act
    # yaw dither only after the bias-init hold (it excites the gyro)
    ta = np.maximum(t_sec - VI_HOLD * T_end, 0.0)
    acty = np.clip(ta / 1.0, 0.0, 1.0)
    acty = acty * acty * (3.0 - 2.0 * acty)
    yaw = yaw + 0.012 * np.sin(2 * np.pi * 1.1 * ta) * acty
    return pos, yaw, pitch


def _so3_log_np(R: np.ndarray) -> np.ndarray:
    """Rotation log (numpy, double): axis*angle from a 3x3 rotation."""
    w = 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                        R[1, 0] - R[0, 1]])
    c = np.clip(0.5 * (np.trace(R) - 1.0), -1.0, 1.0)
    s = np.linalg.norm(w)
    if s < 1e-12:
        return w
    return w * (np.arccos(c) / s)


def _write_imu_csv(seq_dir: str, base_kind: str, n_frames: int) -> str:
    """EuRoC-format IMU CSV exactly consistent with the rendered GT
    trajectory: body rates from the rotation derivative, specific force
    f_b = R_wc^T (a_w - g_w) from the position second derivative +
    gravity (imugrabber.cpp:80 schema, ns timestamps)."""
    T_end = (n_frames - 1) / FPS
    dt_fd = 1e-3
    n_samp = int(np.ceil((VI_T0 + T_end + 0.1) * IMU_HZ))
    tk = np.arange(1, n_samp + 1) / IMU_HZ        # offset clock t'
    t_sec = tk - VI_T0                            # trajectory clock

    def pose(ts):
        pos, yaw, pitch = _vi_pose_at(base_kind, ts, T_end)
        return pos, _build_rots(yaw, pitch)

    p_m, R_m = pose(t_sec - dt_fd)
    p_0, R_0 = pose(t_sec)
    p_p, R_p = pose(t_sec + dt_fd)
    a_w = (p_p - 2.0 * p_0 + p_m) / (dt_fd * dt_fd)
    lines = []
    for i in range(n_samp):
        w_b = _so3_log_np(R_m[i].T @ R_p[i]) / (2.0 * dt_fd)
        f_b = R_0[i].T @ (a_w[i] - G_W)
        t_ns = int(round(tk[i] * 1e9))
        lines.append(f"{t_ns},{w_b[0]:.9f},{w_b[1]:.9f},{w_b[2]:.9f},"
                     f"{f_b[0]:.9f},{f_b[1]:.9f},{f_b[2]:.9f}")
    path = os.path.join(seq_dir, "imu.csv")
    with open(path, "w") as fh:
        fh.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n" +
                 "\n".join(lines) + "\n")
    return path


def render_dataset(seq_dir: str, kind: str, n_frames: int, seed: int):
    """Render + write one DataSetCam dataset; returns GT positions.
    A kind ending in `_vi` renders the time-warped + dithered VI variant
    of the base path and also writes the consistent EuRoC IMU CSV."""
    from PIL import Image

    from rebvo_tpu.io.render import render_billboards_seq

    data_dir = os.path.join(seq_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    vi = kind.endswith("_vi")
    if vi:
        base = kind[:-3]
        t_frames = np.arange(n_frames) / FPS
        pos, yaw, pitch = _vi_pose_at(base, t_frames,
                                      (n_frames - 1) / FPS)
        rot = _build_rots(yaw, pitch)
        _write_imu_csv(seq_dir, base, n_frames)
        t_offset = VI_T0
    else:
        pos, rot = _traj(kind, n_frames)
        t_offset = 0.0
    frames = render_billboards_seq(
        n_frames, width=W, height=H, zf=ZF, cx=CX, cy=CY, seed=seed,
        cam_positions=pos, cam_rotations=rot)
    lines = []
    for i in range(n_frames):
        # 8-bit grayscale PNG; both sides read it back as r+g+b = 3*v
        g = np.clip(frames[i] / 3.0, 0, 255).astype(np.uint8)
        name = f"{i:06d}.png"
        Image.fromarray(g, mode="L").save(os.path.join(data_dir, name))
        t_ns = int(round((t_offset + i / FPS) * 1e9))
        lines.append(f"{t_ns},{name}")
    with open(os.path.join(seq_dir, "data.csv"), "w") as fh:
        fh.write("#timestamp [ns],filename\n" + "\n".join(lines) + "\n")
    np.savetxt(os.path.join(seq_dir, "gt_pos.txt"), pos)
    # persist render provenance so --reuse reports the seed the dataset
    # was actually rendered with (advisor r3: the caller-supplied seed can
    # differ from an older on-disk render's)
    with open(os.path.join(seq_dir, "meta.json"), "w") as fh:
        json.dump({"kind": kind, "n_frames": n_frames, "seed": seed}, fh)
    return pos


def parity_params(seq_dir: str, vi: bool = False):
    from rebvo_tpu.config import REBVOParameters
    p = REBVOParameters().replace(
        ZfX=ZF, ZfY=ZF, PPx=CX, PPy=CY,
        KcR2=0.0, KcR4=0.0, KcR6=0.0, KcP1=0.0, KcP2=0.0,
        ImageWidth=W, ImageHeight=H, config_fps=FPS, soft_fps=FPS,
        useUndistort=0, rotatedCam=0,
        CameraType=2, VideoNetEnabled=0, VideoSave=0, SaveLog=1,
        EncoderType=1, TrackKeyFrames=0,
        DataSetDir=os.path.join(seq_dir, "data") + "/",
        DataSetFile=os.path.join(seq_dir, "data.csv"),
        CamTimeScale=1e-9,
        ImuMode=0, ImuTimeScale=1.0,   # tray t stays in seconds
        StereoAvaiable=0,
        cpuSetAffinity=0,              # container has 2 cores; affinity
                                       # failure aborts the reference
    )
    if vi:
        p = p.replace(
            ImuMode=2,
            ImuFile=os.path.join(seq_dir, "imu.csv"),
            ImuTimeScale=1e-9,
            SampleTime=1.0 / IMU_HZ,   # sizes the repo's IMU windows; the
                                       # reference (ImuMode=2) estimates
                                       # tsample from the data itself
            CamImuSE3File="",          # identity cam-IMU mounting
            TimeDesinc=0.0,
        )
    return p


def write_parity_config(seq_dir: str, vi: bool = False) -> str:
    """Write the shared GlobalConfig consumed by BOTH sides; returns its
    path (idempotent — the config is a pure function of seq_dir)."""
    from rebvo_tpu.config import save_config
    cfg = os.path.join(seq_dir, "GlobalConfig_parity")
    save_config(parity_params(seq_dir, vi=vi), cfg)
    return cfg


def run_reference(seq_dir: str, timeout: float = 600.0, vi: bool = False):
    """Run the reference binary on the dataset; returns (positions,
    wall_seconds) or (None, log) on failure."""
    cfg = write_parity_config(seq_dir, vi=vi)
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = (os.path.join(REPO_ROOT, "native") +
                              ":" + env.get("LD_LIBRARY_PATH", ""))
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [REF_BINARY, cfg], cwd=seq_dir, env=env,
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE)

    def feeder():
        # the reference main loop blocks on `std::cin >> c` between
        # Running() checks; trickle keystrokes until it exits
        try:
            while proc.poll() is None:
                proc.stdin.write(b"x\n")
                proc.stdin.flush()
                time.sleep(0.2)
        except (BrokenPipeError, OSError, ValueError):
            pass  # stdin closed by communicate() at process exit

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    try:
        _, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        return None, f"reference binary timed out after {timeout}s"
    wall = time.perf_counter() - t0
    tray = os.path.join(seq_dir, "rebvo_tray.txt")
    if not os.path.exists(tray):
        return None, (f"no trajectory written (exit {proc.returncode}); "
                      f"stderr: {err.decode(errors='replace')[-500:]}")
    rows = np.loadtxt(tray)
    if rows.ndim != 2 or rows.shape[0] < 10:
        return None, f"trajectory too short: shape {rows.shape}"
    return rows[:, 1:4], wall


def run_repo(seq_dir: str, timeout: float = 1800.0, vi: bool = False):
    """Run this repo's VO (CPU backend, subprocess for isolation);
    returns (positions, wall_seconds)."""
    out_dir = os.path.join(seq_dir, "repo_out")
    cfg = write_parity_config(seq_dir, vi=vi)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "rebvo_tpu.apps.run_vo", "--config", cfg,
         "--cpu", "--out-dir", out_dir],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=timeout)
    wall = time.perf_counter() - t0
    tray = os.path.join(out_dir, "rebvo_tray.txt")
    if r.returncode != 0 or not os.path.exists(tray):
        raise RuntimeError(f"run_vo failed ({r.returncode}):\n"
                           f"{r.stdout[-800:]}\n{r.stderr[-800:]}")
    rows = np.loadtxt(tray)
    return rows[:, 1:4], wall


def _resample(P: np.ndarray, n: int) -> np.ndarray:
    """Linear index resample of a trajectory to n rows (the two systems
    may log a few frames more or fewer at the boundaries)."""
    if len(P) == n:
        return P
    src = np.linspace(0, len(P) - 1, n)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, len(P) - 1)
    w = (src - i0)[:, None]
    return P[i0] * (1 - w) + P[i1] * w


def evaluate_sequence(seq_dir, kind, n_frames, seed, skip_ref=False,
                      reuse=False):
    from rebvo_tpu.io.trajectory import align_umeyama, ate_rmse

    vi = kind.endswith("_vi")
    res = {"sequence": kind, "n_frames": n_frames, "seed": seed,
           "mode": "visual-inertial" if vi else "mono"}
    reusable = (reuse and os.path.exists(os.path.join(seq_dir, "data.csv"))
                and os.path.exists(os.path.join(seq_dir, "gt_pos.txt")))
    if reusable:
        # the dataset and the reference's trajectory are deterministic:
        # reuse them and re-run only this repo's side
        gt = np.loadtxt(os.path.join(seq_dir, "gt_pos.txt"))
        meta_path = os.path.join(seq_dir, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                res["seed"] = json.load(fh).get("seed", seed)
        print(f"[{kind}] reusing rendered dataset + reference run",
              flush=True)
    else:
        print(f"[{kind}] rendering {n_frames} frames ...", flush=True)
        gt = render_dataset(seq_dir, kind, n_frames, seed)

    ref_pos = None
    if not skip_ref:
        tray = os.path.join(seq_dir, "rebvo_tray.txt")
        if reusable and os.path.exists(tray):
            ref_pos = np.loadtxt(tray)[:, 1:4]
        else:
            print(f"[{kind}] running reference binary ...", flush=True)
            ref_pos, ref_info = run_reference(seq_dir, vi=vi)
            if ref_pos is None:
                res["reference_error"] = ref_info
                print(f"[{kind}] reference FAILED: {ref_info}", flush=True)
            else:
                res["ref_wall_s"] = round(ref_info, 2)
                res["ref_fps"] = round(len(ref_pos) / ref_info, 1)

    print(f"[{kind}] running repo VO ...", flush=True)
    repo_pos, repo_wall = run_repo(seq_dir, vi=vi)
    res["repo_wall_s"] = round(repo_wall, 2)

    # skip the bootstrap frames both systems spend converging depth
    warm = min(40, n_frames // 4)
    gt_w = gt[warm:]
    repo_w = _resample(repo_pos, n_frames)[warm:]
    res["ate_repo_vs_gt"] = float(ate_rmse(repo_w, gt_w, with_scale=True))
    if vi:
        # metric-scale convergence: the VI filter's K should make the
        # repo trajectory metric, i.e. the Umeyama alignment scale vs the
        # metric GT should be ~1 (VERDICT r3 #2 done-when criterion)
        s_align, _, _ = align_umeyama(repo_w, gt_w, with_scale=True)
        res["align_scale_repo"] = float(s_align)
        res["scale_ok"] = bool(abs(1.0 - float(s_align)) < 0.10)
    if ref_pos is not None:
        ref_w = _resample(ref_pos, n_frames)[warm:]
        res["ate_ref_vs_gt"] = float(ate_rmse(ref_w, gt_w, with_scale=True))
        res["ate_repo_vs_ref"] = float(
            ate_rmse(repo_w, ref_w, with_scale=True))
        res["repo_beats_ref"] = bool(
            res["ate_repo_vs_gt"] <= res["ate_ref_vs_gt"])
        if vi:
            s_ref, _, _ = align_umeyama(ref_w, gt_w, with_scale=True)
            res["align_scale_ref"] = float(s_ref)
    print(f"[{kind}] {json.dumps({k: v for k, v in res.items() if 'ate' in k})}",
          flush=True)
    return res


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="/tmp/rebvo_parity")
    ap.add_argument("--json", default=os.path.join(REPO_ROOT,
                                                   "PARITY_r03.json"))
    ap.add_argument("--n-frames", type=int, default=240)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--reuse", action="store_true",
                    help="reuse an existing rendered dataset and the "
                         "reference's trajectory; re-run only this repo")
    ap.add_argument("--seqs", default="lateral_arc,dolly,loop")
    args = ap.parse_args(argv)

    # name-keyed scene seeds: the dataset must not depend on which subset
    # of sequences a run evaluates (the recorded PARITY seeds); unknown
    # names get a seed derived from the NAME (stable crc32), never from
    # the position in the subset (advisor r3)
    import zlib
    seq_seed = {"lateral_arc": 7, "dolly": 20, "loop": 33,
                # VI variants reuse the base scene seeds (same billboards)
                "lateral_arc_vi": 7, "dolly_vi": 20, "loop_vi": 33}
    results = []
    for kind in args.seqs.split(","):
        seq_dir = os.path.join(args.out_dir, kind)
        os.makedirs(seq_dir, exist_ok=True)
        seed = seq_seed.get(kind, zlib.crc32(kind.encode()) % 997)
        results.append(evaluate_sequence(seq_dir, kind, args.n_frames,
                                         seed=seed,
                                         skip_ref=args.skip_ref,
                                         reuse=args.reuse))

    ok = [r for r in results if "ate_ref_vs_gt" in r]
    summary = {
        "date": time.strftime("%Y-%m-%d"),
        "reference_binary": REF_BINARY,
        "sequences": results,
        "n_compared": len(ok),
        "repo_beats_ref_all": bool(ok) and all(r["repo_beats_ref"]
                                               for r in ok),
    }
    with open(args.json, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
