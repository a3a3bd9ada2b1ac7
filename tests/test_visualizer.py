"""Telemetry receiver / visualizer tests: the sender->receiver pair over
the native fragmented-UDP transport, with video decode and rendering
(reference visualizer.cpp:245-535)."""

import os
import threading

import numpy as np
import pytest

from rebvo_tpu.io import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library unavailable")


def _fake_klm(K=400, W=376, H=240, seed=0):
    import jax.numpy as jnp

    from rebvo_tpu.frontend.state import KeylineMap
    rng = np.random.RandomState(seed)
    klm = KeylineMap.empty(K)
    return klm._replace(
        valid=jnp.ones((K,), bool),
        x=jnp.asarray(rng.uniform(2, W - 2, K).astype(np.float32)),
        y=jnp.asarray(rng.uniform(2, H - 2, K).astype(np.float32)),
        gx=jnp.asarray(rng.uniform(-1, 1, K).astype(np.float32)),
        gy=jnp.asarray(rng.uniform(-1, 1, K).astype(np.float32)),
        n_m=jnp.ones((K,), jnp.float32),
        rho=jnp.asarray(rng.uniform(0.1, 2.0, K).astype(np.float32)),
        s_rho=jnp.asarray(rng.uniform(0.05, 1.0, K).astype(np.float32)))


def test_receiver_loop_end_to_end(tmp_path):
    """Sender process -> UDP loopback -> receiver loop: packets arrive,
    the MJPEG video decodes, and all renders land on disk."""
    from rebvo_tpu.apps import visualizer
    from rebvo_tpu.io.telemetry import EdgeMapSender
    from rebvo_tpu.io.video import VIDEO_ENCODER_TYPE_MJPEG

    W, H, port = 376, 240, 27411
    n_pkts = 5
    out_dir = str(tmp_path / "view")

    result = {}

    def rx_loop():
        result["n"] = visualizer.run("127.0.0.1", port, out_dir,
                                     max_packets=n_pkts, timeout_ms=4000,
                                     zf=200.0, cx=W / 2.0, dense_every=2,
                                     quiet=True, map_every=2)

    rx = threading.Thread(target=rx_loop)
    rx.start()
    try:
        import time
        tx = EdgeMapSender("127.0.0.1", port, W, H,
                           video_etype=VIDEO_ENCODER_TYPE_MJPEG)
        rng = np.random.RandomState(1)
        frame = (rng.rand(H, W) * 765).astype(np.float32)
        # keep sending while the receiver catches up (the channel is
        # lossy by design: the dense-fill jit compile stalls the reader
        # and fragments dropped meanwhile are expected)
        for i in range(120):
            tx.send(_fake_klm(seed=i), 1.0, np.zeros(3), np.eye(3),
                    0.05 * i, frame=frame)
            time.sleep(0.25)
            if not rx.is_alive():
                break
        rx.join(timeout=60)
        tx.close()
    finally:
        if rx.is_alive():
            rx.join(timeout=5)
    assert result.get("n", 0) >= n_pkts
    files = os.listdir(out_dir)
    assert sum(f.startswith("edges_") for f in files) >= n_pkts
    assert sum(f.startswith("topdown_") for f in files) >= n_pkts
    assert any(f.startswith("depth_") for f in files)
    assert any(f.startswith("map_") for f in files)
    assert "received_tray.txt" in files
    # rendered overlays are real images with keyline pixels on them
    from PIL import Image
    img = np.asarray(Image.open(
        os.path.join(out_dir, sorted(f for f in files
                                     if f.startswith("edges_"))[0])))
    assert img.shape == (H, W, 3)
    assert img.max() > 0


def test_video_roundtrip_in_packet():
    """pack/unpack with an embedded MJPEG frame: decode approximates the
    original; packets without video still parse (back-compat)."""
    from rebvo_tpu.io.telemetry import pack_edgemap, unpack_edgemap
    from rebvo_tpu.io.video import (VIDEO_ENCODER_TYPE_MJPEG, VideoDecoder,
                                    make_encoder)
    W, H = 128, 96
    rng = np.random.RandomState(0)
    frame = np.repeat(np.linspace(0, 765, W, dtype=np.float32)[None, :],
                      H, axis=0)
    enc = make_encoder(VIDEO_ENCODER_TYPE_MJPEG, W, H)
    enc.push_frame(frame)
    video = enc.pop_frame()

    klm = _fake_klm(K=64, W=W, H=H)
    pkt = pack_edgemap(3, W, H, klm, 1.0, np.zeros(3), np.eye(3), 0.1,
                       video=video, video_etype=VIDEO_ENCODER_TYPE_MJPEG)
    out = unpack_edgemap(pkt)
    assert out is not None and out["video"] is not None
    dec = VideoDecoder(W, H).decode(out["video"], out["video_etype"])
    assert dec.shape == (H, W)
    assert np.abs(dec - frame).mean() < 30.0     # lossy but close

    pkt2 = pack_edgemap(4, W, H, klm, 1.0, np.zeros(3), np.eye(3), 0.2)
    out2 = unpack_edgemap(pkt2)
    assert out2 is not None and out2["video"] is None
    assert out2["n"] == out["n"]


def test_render_functions_standalone():
    from rebvo_tpu.apps.visualizer import (render_dense_depth,
                                           render_edge_overlay,
                                           render_topdown)
    from rebvo_tpu.io.telemetry import pack_edgemap, unpack_edgemap
    W, H = 160, 120
    klm = _fake_klm(K=128, W=W, H=H)
    pkt = unpack_edgemap(pack_edgemap(0, W, H, klm, 1.0, np.zeros(3),
                                      np.eye(3), 0.0))
    ov = render_edge_overlay(pkt)
    assert ov.shape == (H, W, 3) and ov.max() > 0
    td = render_topdown(pkt, zf=100.0, cx=W / 2.0, size=128)
    assert td.shape == (128, 128, 3) and td.max() > 0
    dd = render_dense_depth(pkt)
    assert dd.ndim == 3 and dd.max() > 0
