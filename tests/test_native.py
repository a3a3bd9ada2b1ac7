"""Tests for the native C++ runtime library (comm + loader + ring)."""

import ctypes as C
import os
import threading

import numpy as np
import pytest

from rebvo_tpu.io import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library failed to build")


def test_crc16_known_vector():
    # Modbus CRC16 of "123456789" is 0x4B37
    assert native.crc16(b"123456789") == 0x4B37
    assert native.crc16(b"") == 0xFFFF


def test_pipeline_ring_semantics():
    lib = native.load_native()
    h = lib.rn_pipeline_create(2, 2)
    # producer claims both slots, consumer blocks until release
    s0 = lib.rn_pipeline_request(h, 0, 100)
    assert s0 == 0
    lib.rn_pipeline_release(h, 0)
    s1 = lib.rn_pipeline_request(h, 0, 100)
    assert s1 == 1
    # consumer can now take slot 0
    c0 = lib.rn_pipeline_request(h, 1, 100)
    assert c0 == 0
    # producer cannot reclaim slot 0 until the consumer releases
    lib.rn_pipeline_release(h, 0)           # releases slot 1
    assert lib.rn_pipeline_request(h, 0, 50) == -1    # slot 0 still held
    lib.rn_pipeline_release(h, 1)
    assert lib.rn_pipeline_request(h, 0, 100) == 0
    lib.rn_pipeline_destroy(h)


def test_udp_fragmented_roundtrip():
    port = 27311
    rx = native.UdpPort("127.0.0.1", port, bind=True)
    tx = native.UdpPort("127.0.0.1", port)
    payload = os.urandom(150_000)           # forces ~5 fragments

    got = {}

    def recv():
        got["data"] = rx.recv(max_size=1 << 20, timeout_ms=3000)

    th = threading.Thread(target=recv)
    th.start()
    nfrag = tx.send(payload)
    th.join()
    assert nfrag == 5
    assert got["data"] == payload
    # timeout path returns None
    assert rx.recv(max_size=1024, timeout_ms=50) is None
    tx.close()
    rx.close()


def test_keyline_quantization_roundtrip():
    from rebvo_tpu.frontend.state import KeylineMap
    import jax.numpy as jnp
    K = 64
    n = 40
    rng = np.random.RandomState(0)
    klm = KeylineMap.empty(K)
    x = rng.uniform(0, 750, n).astype(np.float32)
    y = rng.uniform(0, 480, n).astype(np.float32)
    rho = rng.uniform(0.05, 3.0, n).astype(np.float32)
    s_rho = rng.uniform(0.01, 1.0, n).astype(np.float32)
    gx = rng.randn(n).astype(np.float32)
    gy = rng.randn(n).astype(np.float32)
    nm = np.hypot(gx, gy)
    n_id = np.concatenate([np.arange(1, n), [-1]]).astype(np.int32)
    pad = lambda a, fill=0: np.concatenate(
        [a, np.full(K - n, fill, a.dtype)])
    klm = klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        x=jnp.asarray(pad(x)), y=jnp.asarray(pad(y)),
        gx=jnp.asarray(pad(gx)), gy=jnp.asarray(pad(gy)),
        n_m=jnp.asarray(pad(nm, 1.0)),
        rho=jnp.asarray(pad(rho, 1.0)), s_rho=jnp.asarray(pad(s_rho, 1.0)),
        n_id=jnp.asarray(pad(n_id, -1)),
        m_num=jnp.asarray(pad(np.full(n, 3, np.int32))))

    k_scale = 1.7
    data, cnt = native.quantize_keylines(klm, k_scale)
    assert cnt == n
    out = native.dequantize_keylines(data, k_scale)
    np.testing.assert_allclose(out["x"], x, atol=1.0 / 8)
    np.testing.assert_allclose(out["y"], y, atol=1.0 / 8)
    np.testing.assert_allclose(out["rho"], rho, atol=k_scale / 10000 + 1e-4)
    np.testing.assert_allclose(out["s_rho"], s_rho,
                               atol=k_scale / 10000 + 1e-4)
    # chain links rewired to network ids (here identity since all valid)
    np.testing.assert_array_equal(out["n_id"], n_id)
    # unit gradients within 1/127
    np.testing.assert_allclose(out["gx"], gx / nm, atol=0.02)


def test_native_frame_loader(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "data"
    img_dir.mkdir()
    lines = []
    W, H = 32, 24
    truth = []
    for i in range(5):
        ts = 1000000000 + i * 50000000
        arr = (np.random.RandomState(i).rand(H, W) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{ts}.png")
        lines.append(f"{ts},{ts}.png")
        truth.append(arr.astype(np.float32) * 3.0)
    (tmp_path / "data.csv").write_text("#header\n" + "\n".join(lines))

    ld = native.NativeFrameLoader(str(tmp_path / "data.csv"), str(img_dir),
                                  W, H)
    assert len(ld) == 5
    frames = list(ld)
    ld.close()
    assert len(frames) == 5
    for i, (t, f) in enumerate(frames):
        assert abs(t - (1.0 + i * 0.05)) < 1e-6
        np.testing.assert_allclose(f, truth[i], atol=1e-3)


def test_native_frame_loader_pgm(tmp_path):
    img_dir = tmp_path / "data"
    img_dir.mkdir()
    W, H = 16, 8
    arr = (np.arange(H * W) % 250).astype(np.uint8).reshape(H, W)
    with open(img_dir / "100.pgm", "wb") as fh:
        fh.write(b"P5\n# comment\n16 8\n255\n")
        fh.write(arr.tobytes())
    (tmp_path / "data.csv").write_text("100,100.pgm\n")
    ld = native.NativeFrameLoader(str(tmp_path / "data.csv"), str(img_dir),
                                  W, H, time_scale=1.0)
    frames = list(ld)
    ld.close()
    assert len(frames) == 1
    np.testing.assert_allclose(frames[0][1], arr * 3.0, atol=1e-3)


def test_telemetry_roundtrip():
    import threading
    import jax.numpy as jnp
    from rebvo_tpu.frontend.state import KeylineMap
    from rebvo_tpu.io.telemetry import EdgeMapReceiver, EdgeMapSender

    K = 32
    klm = KeylineMap.empty(K)
    klm = klm._replace(
        valid=jnp.asarray(np.arange(K) < 10),
        x=jnp.arange(K, dtype=jnp.float32) * 3,
        y=jnp.arange(K, dtype=jnp.float32) * 2,
        rho=jnp.full((K,), 0.5, jnp.float32),
        s_rho=jnp.full((K,), 0.1, jnp.float32))
    port = 27411
    rx = EdgeMapReceiver("127.0.0.1", port)
    tx = EdgeMapSender("127.0.0.1", port, 752, 480)

    got = {}
    th = threading.Thread(
        target=lambda: got.update(pkt=rx.recv(timeout_ms=3000)))
    th.start()
    tx.send(klm, 1.5, [1.0, 2.0, 3.0], np.eye(3), 7.25)
    th.join()
    pkt = got["pkt"]
    assert pkt is not None
    assert pkt["n"] == 10
    assert pkt["width"] == 752
    np.testing.assert_allclose(pkt["Pos"], [1, 2, 3])
    assert abs(pkt["t"] - 7.25) < 1e-6
    np.testing.assert_allclose(pkt["keylines"]["x"][:5],
                               np.arange(5) * 3, atol=0.2)
    tx.close()
    rx.close()


def test_telemetry_edgemap_delay():
    """EdgeMapDelay ring (rebvo_third_t.cpp:71-83): with delay=2 the
    first two sends emit nothing; the third emits frame 0's payload."""
    import threading
    import jax.numpy as jnp
    from rebvo_tpu.frontend.state import KeylineMap
    from rebvo_tpu.io.telemetry import EdgeMapReceiver, EdgeMapSender

    K = 8
    klm = KeylineMap.empty(K)._replace(
        valid=jnp.asarray(np.arange(K) < 4))
    port = 27413
    rx = EdgeMapReceiver("127.0.0.1", port)
    tx = EdgeMapSender("127.0.0.1", port, 64, 48, edgemap_delay=2)
    assert tx.send(klm, 1.0, [0.0, 0.0, 0.0], np.eye(3), 10.0) == 0
    assert tx.send(klm, 1.0, [0.0, 0.0, 0.0], np.eye(3), 10.05) == 0
    got = {}
    th = threading.Thread(
        target=lambda: got.update(pkt=rx.recv(timeout_ms=3000)))
    th.start()
    n = tx.send(klm, 1.0, [9.0, 9.0, 9.0], np.eye(3), 10.10)
    th.join()
    assert n > 0
    pkt = got["pkt"]
    assert pkt is not None
    # the payload is the DELAYED frame's (t=10.0, pos=0), not the current
    assert abs(pkt["t"] - 10.0) < 1e-6
    np.testing.assert_allclose(pkt["Pos"], [0.0, 0.0, 0.0])
    tx.close()
    rx.close()
