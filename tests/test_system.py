"""Tests for the top-level VOSystem, recorder/replay, and batch app."""

import os

import jax.numpy as jnp
import numpy as np

from rebvo_tpu.io.recorder import FrameRecorder, SimReplay
from rebvo_tpu.system import VOSystem
from tests.render import render_billboards_seq
from tests.test_vo_step import SMALL, small_params


def test_recorder_replay_roundtrip(tmp_path):
    W, H = 32, 24
    path = str(tmp_path / "rec.rvsim")
    rec = FrameRecorder(path, W, H)
    frames = [np.random.RandomState(i).rand(H, W).astype(np.float32) * 700
              for i in range(4)]
    for i, f in enumerate(frames):
        rec.push(0.05 * i, f)
    rec.close()

    rep = SimReplay(path)
    out = list(rep)
    rep.close()
    assert len(out) == 4
    for i, (t, f) in enumerate(out):
        assert abs(t - 0.05 * i) < 1e-9
        np.testing.assert_array_equal(f, frames[i])


def test_simulated_clock_deterministic_replay(tmp_path):
    """TTimer::TurnSimuOn parity: replay under the simulated clock is
    time-deterministic — the clock is frame-locked, not wall-locked, and
    two replays observe identical time sequences."""
    import time

    from rebvo_tpu.io.recorder import SimClock
    W, H = 16, 12
    path = str(tmp_path / "rec.rvsim")
    rec = FrameRecorder(path, W, H)
    for i in range(5):
        rec.push(10.0 + 0.05 * i, np.zeros((H, W), np.float32))
    rec.close()

    def run_once(consumer_delay):
        clock = SimClock()
        clock.turn_simu_on(start=-2.0, sweep=3.0, step=1e-3)
        rep = SimReplay(path, clock=clock)
        seen = []
        for t, f in rep:
            time.sleep(consumer_delay)         # host speed must not matter
            seen.append((t, clock.now()))
        rep.close()
        return seen

    a = run_once(0.0)
    b = run_once(0.02)
    assert a == b                              # deterministic across runs
    # the clock advanced to each frame's timestamp exactly
    for (t, now) in a:
        assert now == t
    # ticking advances by step*sweep
    clock = SimClock()
    clock.turn_simu_on(start=0.0, sweep=3.0, step=1e-3)
    clock.tick(4)
    assert abs(clock.now() - 0.012) < 1e-12
    # wall mode still moves with real time
    wall = SimClock()
    t0 = wall.now()
    time.sleep(0.01)
    assert wall.now() > t0


def test_vosystem_vision_only(tmp_path):
    n = 6
    kw = {k: v for k, v in SMALL.items() if k != "z0"}
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 0.02
    frames = render_billboards_seq(n, cam_positions=pos, **kw)
    params = small_params().replace(TrackKeyFrames=1, SaveLog=1)
    sys_ = VOSystem(params)
    navs = []
    sys_.setOutputCallback(lambda out: navs.append(out))
    for i in range(n):
        sys_.process_frame(frames[i], i / 20.0)
    assert len(navs) == n - 1
    nav = sys_.getNav()
    assert nav is not None
    assert np.all(np.isfinite(np.asarray(nav.Pos)))
    # the bootstrap keyframe was pushed
    assert int(sys_.kf_store.count) >= 1
    assert len(sys_.pose_log.meas) == n - 1
    # the pose-graph edges carry the transported estimator information
    # (rebvo_second_t.cpp:326-334), not an identity placeholder
    Ws = np.stack([m.W for m in sys_.pose_log.meas])
    assert np.all(np.isfinite(Ws))
    np.testing.assert_allclose(Ws[-1], Ws[-1].T, atol=1e-4)
    assert not np.allclose(Ws[-1], np.eye(6))
    assert not np.allclose(Ws[-1], Ws[1])      # per-frame, not constant
    # and the log feeds the GN pose-graph optimizer directly
    from rebvo_tpu.backend.posegraph import (optimize_pose_graph,
                                             problem_from_log)
    prob, n_nodes = problem_from_log(sys_.pose_log)
    R0 = jnp.asarray(np.broadcast_to(np.eye(3), (n_nodes, 3, 3)),
                     jnp.float32)
    p0 = jnp.zeros((n_nodes, 3), jnp.float32)
    _, _, costs = optimize_pose_graph(R0, p0, prob, iters=3)
    assert np.all(np.isfinite(np.asarray(costs)))

    out_dir = str(tmp_path / "out")
    sys_.save_outputs(out_dir)
    assert os.path.exists(os.path.join(out_dir, params.TrayFile))
    assert os.path.exists(os.path.join(out_dir, params.LogFile))

    sys_.TakeSnapshot(str(tmp_path / "kf.npz"), str(tmp_path / "poses.npz"))
    assert os.path.exists(tmp_path / "kf.npz")

    # view_map renders the snapshot
    from rebvo_tpu.apps.view_map import main as view_main
    png = str(tmp_path / "map.png")
    view_main([str(tmp_path / "kf.npz"), "--out", png,
               "--zfm", str(SMALL["zf"]), "--cx", str(SMALL["cx"]),
               "--cy", str(SMALL["cy"])])
    assert os.path.exists(png) and os.path.getsize(png) > 2000


def test_vosystem_reset():
    n = 4
    kw = {k: v for k, v in SMALL.items() if k != "z0"}
    frames = render_billboards_seq(n, **kw)
    sys_ = VOSystem(small_params())
    for i in range(3):
        sys_.process_frame(frames[i], i / 20.0)
    pos_before = np.asarray(sys_.getNav().Pos)
    sys_.Reset()
    sys_.process_frame(frames[3], 3 / 20.0)   # becomes a bootstrap frame
    assert sys_.frame_count == 1
    assert float(jnp.linalg.norm(sys_.state.Pos)) == 0.0


def test_vosystem_push_imu_window():
    sys_ = VOSystem(small_params().replace(ImuMode=2))
    for k in range(10):
        sys_.pushIMU(0.005 * k, [0.01, 0, 0], [0, -9.8, 0])
    win = sys_._collect_imu_window(0.0, 0.03)
    assert int(win.count) == 6          # samples at 0.005..0.030
    np.testing.assert_allclose(np.asarray(win.gyro[0]), [0.01, 0, 0])
    # consumed samples are dropped
    win2 = sys_._collect_imu_window(0.0, 0.03)
    assert int(win2.count) == 0


def test_run_batch_synthetic(tmp_path):
    from rebvo_tpu.apps.run_batch import main
    out = str(tmp_path / "b")
    main(["--synthetic", "4", "--batch", "4", "--cpu", "--out-dir", out])
    trays = [f for f in os.listdir(out) if f.startswith("tray_seq")]
    assert len(trays) == 4
