import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rebvo_tpu.core.geometry import CameraModel
from rebvo_tpu.io.dataset import (DatasetSequence, read_euroc_imu,
                                  read_image_list, slice_imu_windows,
                                  read_cam_imu_se3)
from rebvo_tpu.io.trajectory import (align_umeyama, ate_rmse, read_tum,
                                     write_tum)
from rebvo_tpu.io.undistort import apply_undistort, build_undistort_map


def test_tum_roundtrip(tmp_path):
    ts = [0.0, 0.05, 0.1]
    pos = np.array([[0, 0, 0], [0.1, 0, 0], [0.2, 0.01, 0]], float)
    quat = np.tile([0, 0, 0, 1.0], (3, 1))
    p = tmp_path / "traj.txt"
    write_tum(str(p), ts, pos, quat)
    t2, p2, q2 = read_tum(str(p))
    np.testing.assert_allclose(t2, ts)
    np.testing.assert_allclose(p2, pos, atol=1e-8)
    np.testing.assert_allclose(q2, quat, atol=1e-8)


def test_umeyama_alignment():
    rng = np.random.RandomState(0)
    gt = rng.randn(40, 3)
    s, Rm, t = 2.5, None, np.array([1.0, -2.0, 0.5])
    from rebvo_tpu.core.geometry import so3_exp
    Rm = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)),
                    np.float64)
    est = ((gt - t) @ Rm) / s        # inverse similarity
    s2, R2, t2 = align_umeyama(est, gt)
    np.testing.assert_allclose(s2, s, rtol=1e-5)
    assert ate_rmse(est, gt) < 1e-6


def test_euroc_csv_parsing(tmp_path):
    cam_csv = tmp_path / "data.csv"
    cam_csv.write_text("#timestamp [ns],filename\n"
                       "1403636579763555584,1403636579763555584.png\n"
                       "1403636579813555456,1403636579813555456.png\n")
    recs = read_image_list(str(cam_csv), "/imgs")
    assert len(recs) == 2
    assert abs(recs[0].t - 1403636579.763555584) < 1e-6
    assert recs[0].path == "/imgs/1403636579763555584.png"

    imu_csv = tmp_path / "imu.csv"
    imu_csv.write_text("#t,gx,gy,gz,ax,ay,az\n"
                       "1000000000,0.1,0.2,0.3,9.0,0.5,0.1\n"
                       "1005000000,0.2,0.2,0.3,9.1,0.5,0.1\n"
                       "1010000000,0.3,0.2,0.3,9.2,0.5,0.1\n")
    imu = read_euroc_imu(str(imu_csv))
    assert imu.shape == (3, 7)
    np.testing.assert_allclose(imu[0], [1.0, 0.1, 0.2, 0.3, 9.0, 0.5, 0.1])

    se3 = tmp_path / "se3.csv"
    se3.write_text("1,0,0, 0,1,0, 0,0,1, 0.1,0.2,0.3\n")
    R, T = read_cam_imu_se3(str(se3))
    np.testing.assert_allclose(R, np.eye(3))
    np.testing.assert_allclose(T, [0.1, 0.2, 0.3])


def test_slice_imu_windows():
    imu = np.zeros((20, 7))
    imu[:, 0] = np.arange(20) * 0.005          # 200 Hz
    imu[:, 1] = np.arange(20)                  # gx encodes the index
    wins = slice_imu_windows(imu, [0.049, 0.099], window_size=16)
    assert int(wins[0].count) == 10            # samples 0.000..0.045? ->
    # frame window is (t_prev, t]: first window gets t in (-inf, 0.049]
    got = np.asarray(wins[0].gyro[:10, 0])
    np.testing.assert_allclose(got, np.arange(10))
    assert int(wins[1].count) == 10
    got2 = np.asarray(wins[1].gyro[:10, 0])
    np.testing.assert_allclose(got2, np.arange(10, 20))


def test_dataset_sequence_iterates(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "data"
    img_dir.mkdir()
    lines = ["#ts,filename"]
    for i in range(3):
        ts = 1000000000 + i * 50000000
        arr = (np.random.RandomState(i).rand(24, 32) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{ts}.png")
        lines.append(f"{ts},{ts}.png")
    (tmp_path / "data.csv").write_text("\n".join(lines))
    recs = read_image_list(str(tmp_path / "data.csv"), str(img_dir))
    seq = DatasetSequence(recs)
    out = list(seq)
    assert len(out) == 3
    t, frame, win = out[0]
    assert frame.shape == (24, 32)
    assert frame.max() <= 765.0 and frame.max() > 100
    assert win is None


def test_undistort_map_identity():
    cam = CameraModel.make(200.0, 200.0, 94.0, 60.0, width=188, height=120)
    umap = build_undistort_map(cam)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(120, 188).astype(np.float32) * 700)
    out = apply_undistort(umap, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.05)


def test_undistort_map_radial():
    """With radial distortion, applying the map must land each ideal
    pixel on its distorted source position."""
    cam = CameraModel.make(200.0, 200.0, 94.0, 60.0, kc2=-0.2, kc4=0.05,
                           width=188, height=120)
    umap = build_undistort_map(cam)
    # gradient image: intensity = source x coordinate -> output pixel
    # (x,y) should read approximately its distorted source x
    xx = np.tile(np.arange(188, dtype=np.float32), (120, 1))
    out = np.asarray(apply_undistort(umap, jnp.asarray(xx)))
    sx = np.asarray(umap.src_x)
    inb = (sx >= 0) & (sx <= 187)
    np.testing.assert_allclose(out[inb], sx[inb], atol=1e-2)


def test_run_vo_synthetic_cli(tmp_path):
    from rebvo_tpu.apps.run_vo import main
    out_dir = tmp_path / "out"
    main(["--synthetic", "6", "--out-dir", str(out_dir), "--cpu"])
    tray = out_dir / "rebvo_tray.txt"
    assert tray.exists()
    t, p, q = read_tum(str(tray))
    assert len(t) == 5            # 6 frames, first is bootstrap
    log = (out_dir / "rebvo_log.m").read_text()
    assert "Pos=[" in log and "KLnum=[" in log


def test_evaluate_cli(tmp_path):
    from rebvo_tpu.apps.evaluate import main
    ts = np.arange(10) * 0.05
    gt = np.zeros((10, 3))
    gt[:, 0] = np.arange(10) * 0.1
    est = gt * 0.5 + np.array([1.0, 2.0, 3.0])   # scaled + offset
    q = np.tile([0, 0, 0, 1.0], (10, 1))
    write_tum(str(tmp_path / "est.txt"), ts, est, q)
    write_tum(str(tmp_path / "gt.txt"), ts, gt, q)
    res = main([str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")])
    assert res["pairs"] == 10
    assert res["ate_rmse_m"] < 1e-6      # similarity-aligned


def test_video_codecs_roundtrip(tmp_path):
    import pytest
    from rebvo_tpu.io.video import (VIDEO_ENCODER_TYPE_MJPEG,
                                    VIDEO_ENCODER_TYPE_RAW, EncoderMFC,
                                    VideoDecoder, VideoStreamWriter,
                                    make_encoder, read_video_stream,
                                    stream_dims)

    H, W = 48, 64
    rng = np.random.RandomState(0)
    # smooth frame (JPEG-friendly), RGB-sum scale 0..765
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = [(380 + 370 * np.sin(xx / 9 + i) * np.cos(yy / 7)).astype(
        np.float32) for i in range(3)]

    path = tmp_path / "video.rvv"
    wr = VideoStreamWriter(str(path), W, H)
    for etype in (VIDEO_ENCODER_TYPE_RAW, VIDEO_ENCODER_TYPE_MJPEG):
        enc = make_encoder(etype, W, H)
        assert enc.pop_frame() is None
        for i, f in enumerate(frames):
            enc.push_frame(f)
            wr.write(float(i), enc.pop_frame(), etype)
    wr.close()

    assert stream_dims(str(path)) == (W, H)
    dec = VideoDecoder(W, H)
    pkts = list(read_video_stream(str(path)))
    assert len(pkts) == 6
    for k, (t, etype, data) in enumerate(pkts):
        out = dec.decode(data, etype)
        assert out.shape == (H, W)
        tol = 3.5 if etype == VIDEO_ENCODER_TYPE_RAW else 30.0
        assert np.abs(out - frames[k % 3]).mean() < tol, (k, etype)
    # raw is exact up to the u8 quantization
    t0, e0, d0 = pkts[0]
    assert np.abs(dec.decode(d0, e0) - frames[0]).max() <= 3.0

    with pytest.raises(NotImplementedError):
        EncoderMFC()


def test_run_vo_save_video(tmp_path):
    from rebvo_tpu.apps.run_vo import main
    from rebvo_tpu.io.video import read_video_stream, stream_dims

    main(["--synthetic", "6", "--out-dir", str(tmp_path), "--cpu",
          "--save-video", "mjpeg"])
    vp = tmp_path / "video.rvv"
    assert vp.exists()
    pkts = list(read_video_stream(str(vp)))
    assert len(pkts) == 6
    w, h = stream_dims(str(vp))
    assert (w, h) == (752, 480)


def test_mfile_loader_reads_both_systems(tmp_path):
    """One loader parses the rebvo_log.m of EITHER system (the log
    census done-when): the repo's write_mfile round-trips through
    read_mfile, its reference-census section carries exactly the
    reference's per-frame array set (rebvo_third_t.cpp:259-313), and —
    when a parity run's artifacts are on disk — the reference binary's
    own log parses with the same function."""
    import numpy as np

    from rebvo_tpu.io.logger import RunLogger, read_mfile

    REF_CENSUS = {
        "Acel_cv", "As_cv", "Av_cv", "CAcel_cv", "DGiro_cv", "GBias_cv",
        "Giro_cv", "KLN_cv", "K_cv", "Kp_cv", "Pos_cv", "Pose_cv",
        "Posgv_cv", "RKp_cv", "RotGiro_cv", "Rot_cv", "SMM_cv",
        "TProc0_cv", "TProc1_cv", "TProc2_cv", "VBias_cv", "Vel_cv",
        "dWgv_cv", "dWv_cv", "dt_cv", "g_cv", "i_cv", "t_cv",
    }

    lg = RunLogger()
    rng = np.random.RandomState(0)
    for i in range(5):
        lg._rows.append(dict(
            t=0.05 * (i + 1), dt=0.05, RotLie=rng.randn(3) * 0.01,
            Vel=rng.randn(3) * 0.01, PoseLie=rng.randn(3) * 0.01,
            Pos=rng.randn(3), Pose=np.eye(3), Rot=np.eye(3),
            g=np.array([0.0, 9.8, 0.0]), scale=1.5, ok=True,
            kl_num=1000 + i, klm_num=900, s_rho_q=2.0, score=0.1,
            stereo_num=0, Kp=1.01, RKp=1e-5,
            imu_dbg=rng.randn(11, 3), tproc=(0.001, 0.002, 0.0)))
    path = str(tmp_path / "rebvo_log.m")
    lg.write_mfile(path)
    parsed = read_mfile(path)
    assert REF_CENSUS <= set(parsed), REF_CENSUS - set(parsed)
    assert parsed["K_cv"].shape == (5, 1)
    np.testing.assert_allclose(parsed["K_cv"][:, 0], 1.5)
    np.testing.assert_allclose(parsed["Pos_cv"],
                               np.stack([r["Pos"] for r in lg._rows]),
                               rtol=1e-6)
    assert parsed["Rot_cv"].shape[1] == 9   # 3x3 flattened per frame

    ref_log = "/tmp/rebvo_parity/loop/rebvo_log.m"
    if os.path.exists(ref_log):
        ref = read_mfile(ref_log)
        assert REF_CENSUS <= set(ref)
        assert ref["K_cv"].shape[0] > 100
