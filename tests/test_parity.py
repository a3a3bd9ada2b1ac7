"""Golden head-to-head gate vs the actual reference binary.

Runs apps/parity.py's machinery on one short sequence: render a
DataSetCam dataset, run /root/reference/app/rebvorun/rebvorun on it
(via the native/libv4l2.so.0 stub), run this repo's run_vo on the same
frames + config, and gate the trajectories against each other. The
full 3-sequence study lives in PARITY_r03.json (apps/parity.py).
"""

import os
import subprocess

import numpy as np
import pytest

from rebvo_tpu.apps import parity

pytestmark = pytest.mark.skipif(
    not os.path.exists(parity.REF_BINARY),
    reason="reference binary not available")


@pytest.fixture(scope="module")
def stub_built():
    subprocess.run(["make", "-C", os.path.join(parity.REPO_ROOT, "native")],
                   check=True, capture_output=True)


@pytest.mark.timeout(560)
def test_head_to_head_vs_reference_binary(tmp_path, stub_built):
    from rebvo_tpu.io.trajectory import ate_rmse

    n = 80
    seq_dir = str(tmp_path / "seq")
    os.makedirs(seq_dir, exist_ok=True)
    gt = parity.render_dataset(seq_dir, "lateral_arc", n, seed=7)

    ref_pos, ref_info = parity.run_reference(seq_dir)
    assert ref_pos is not None, ref_info

    repo_pos, _ = parity.run_repo(seq_dir)

    warm = 20
    gt_w = gt[warm:]
    repo_w = parity._resample(repo_pos, n)[warm:]
    ref_w = parity._resample(ref_pos, n)[warm:]

    ate_repo = ate_rmse(repo_w, gt_w, with_scale=True)
    ate_ref = ate_rmse(ref_w, gt_w, with_scale=True)
    ate_cross = ate_rmse(repo_w, ref_w, with_scale=True)

    # the two systems track each other to a few millimetres on a
    # decimetre-scale path
    assert ate_cross < 0.02, (ate_cross, ate_repo, ate_ref)
    # and this repo stays within 3x of the reference on a short run
    # (the 240-frame study where the repo WINS 2/3 is PARITY_r03.json)
    assert ate_repo < 3.0 * ate_ref, (ate_repo, ate_ref)
    assert np.isfinite(repo_w).all() and np.isfinite(ref_w).all()
