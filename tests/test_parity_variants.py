"""Unit checks for the parity harness's distorted/stereo dataset
generation (the head-to-head runs themselves are in apps/parity.py and
PARITY_r04.json; these tests pin the geometry of the generated data).
"""

import numpy as np

from rebvo_tpu.apps import parity


def test_distort_warp_roundtrip():
    """Warping the pinhole rendering into the distorted camera and then
    applying the repo's undistortion map must reproduce the pinhole
    image in the interior (away from the resampling border)."""
    import jax.numpy as jnp

    from rebvo_tpu.core.geometry import CameraModel
    from rebvo_tpu.io.undistort import apply_undistort, build_undistort_map

    m = 128
    rng = np.random.RandomState(3)
    # smooth synthetic image (bilinear resampling must not alias)
    yy, xx = np.meshgrid(
        np.arange(parity.H + 2 * m), np.arange(parity.W + 2 * m),
        indexing="ij")
    big = (300 + 200 * np.sin(xx / 23.0) * np.cos(yy / 31.0)
           + 50 * np.sin((xx + 2 * yy) / 57.0)).astype(np.float64)
    dist = parity._distort_frames(big[None], m)[0]

    cam = CameraModel.make(parity.ZF, parity.ZF, parity.CX, parity.CY,
                           kc2=parity.DIST_KC2, kc4=parity.DIST_KC4,
                           width=parity.W, height=parity.H)
    umap = build_undistort_map(cam)
    undist = np.asarray(apply_undistort(umap, jnp.asarray(dist)))

    ideal = big[m:m + parity.H, m:m + parity.W]
    # interior crop: the border ring mixes clamped samples
    c = 40
    err = np.abs(undist[c:-c, c:-c] - ideal[c:-c, c:-c])
    assert np.median(err) < 1.0, np.median(err)
    assert np.percentile(err, 99) < 6.0, np.percentile(err, 99)


def test_distort_newton_inverts_distortion():
    """The Newton undistort used for dataset generation must invert the
    repo's (== reference's) closed-form distortion to sub-millipixel."""
    from rebvo_tpu.core.geometry import CameraModel

    cam = CameraModel.make(parity.ZF, parity.ZF, parity.CX, parity.CY,
                           kc2=parity.DIST_KC2, kc4=parity.DIST_KC4,
                           width=parity.W, height=parity.H)
    rng = np.random.RandomState(0)
    hx = rng.uniform(-parity.CX, parity.CX, 500)
    hy = rng.uniform(-parity.CY, parity.CY, 500)
    dx, dy = (np.asarray(v) for v in cam.distort_hom(hx, hy))
    ux, uy = parity._undistort_radial_np(dx, dy, parity.DIST_KC2,
                                         parity.DIST_KC4, parity.ZF)
    assert np.max(np.abs(ux - hx)) < 1e-3
    assert np.max(np.abs(uy - hy)) < 1e-3


def test_stereo_pair_pose_geometry():
    """A world point must satisfy p_c1 = ST_R p_c0 + ST_T under the pair
    camera poses generated for the `_st` datasets (the transform the
    reference hard-codes, rebvo_second_t.cpp:467-470)."""
    pos, yaw, pitch = parity._traj_eval("loop", np.linspace(0, 1, 7))
    rot = parity._build_rots(yaw, pitch)
    pos1, rot1 = parity._pair_poses(pos, rot)
    rng = np.random.RandomState(1)
    pw = rng.uniform(-2, 2, (7, 3)) + np.array([0, 0, 4.0])
    for i in range(7):
        p_c0 = rot[i].T @ (pw[i] - pos[i])
        p_c1 = rot1[i].T @ (pw[i] - pos1[i])
        np.testing.assert_allclose(p_c1, parity.ST_R @ p_c0 + parity.ST_T,
                                   atol=1e-10)


def test_vi_dataset_files(tmp_path):
    """VI variant writes a schema-correct EuRoC IMU CSV whose gyro
    integrates to the frame-to-frame GT rotation."""
    seq_dir = str(tmp_path)
    n = 24
    gt = parity.render_dataset(seq_dir, "dolly_vi", n, seed=5)
    assert gt.shape == (n, 3)
    imu = np.loadtxt(f"{seq_dir}/imu.csv", delimiter=",", skiprows=1)
    assert imu.shape[1] == 7
    # timestamps strictly increasing, ~IMU_HZ spacing, covering the run
    dt = np.diff(imu[:, 0]) * 1e-9
    assert np.allclose(dt, 1.0 / parity.IMU_HZ, atol=1e-6)
    assert imu[-1, 0] * 1e-9 >= parity.VI_T0 + (n - 1) / parity.FPS
