"""ctypes bindings for the native runtime library (native/rebvo_native.cpp).

Builds lazily with `make -C native` on first use if the shared object is
missing; every feature has a pure-Python fallback elsewhere in io/, so
the bindings degrade gracefully (`native_available()`).
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librebvo_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def load_native(build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and build:
        if not _build():
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = C.CDLL(_SO_PATH)

    lib.rn_crc16.restype = C.c_uint16
    lib.rn_crc16.argtypes = [C.c_char_p, C.c_int]

    lib.rn_pipeline_create.restype = C.c_void_p
    lib.rn_pipeline_create.argtypes = [C.c_int, C.c_int]
    lib.rn_pipeline_destroy.argtypes = [C.c_void_p]
    lib.rn_pipeline_request.restype = C.c_int
    lib.rn_pipeline_request.argtypes = [C.c_void_p, C.c_int, C.c_int]
    lib.rn_pipeline_release.argtypes = [C.c_void_p, C.c_int]

    lib.rn_udp_create.restype = C.c_void_p
    lib.rn_udp_create.argtypes = [C.c_char_p, C.c_int, C.c_int]
    lib.rn_udp_destroy.argtypes = [C.c_void_p]
    lib.rn_udp_send_fragmented.restype = C.c_int
    lib.rn_udp_send_fragmented.argtypes = [C.c_void_p, C.c_char_p, C.c_int]
    lib.rn_udp_recv_fragmented.restype = C.c_int
    lib.rn_udp_recv_fragmented.argtypes = [C.c_void_p, C.c_char_p, C.c_int,
                                           C.c_int]

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.rn_net_keyline_size.restype = C.c_int
    lib.rn_quantize_keylines.restype = C.c_int
    lib.rn_quantize_keylines.argtypes = [
        f32p, f32p, f32p, f32p, f32p, f32p, f32p, i32p, i32p, u8p,
        C.c_int, C.c_float, u8p, i32p]
    lib.rn_dequantize_keylines.argtypes = [
        u8p, C.c_int, C.c_float, f32p, f32p, f32p, f32p, i32p, i32p,
        f32p, f32p]

    lib.rn_loader_open.restype = C.c_void_p
    lib.rn_loader_open.argtypes = [C.c_char_p, C.c_char_p, C.c_double,
                                   C.c_int, C.c_int, C.c_int]
    lib.rn_loader_count.restype = C.c_int
    lib.rn_loader_count.argtypes = [C.c_void_p]
    lib.rn_loader_next.restype = C.c_int
    lib.rn_loader_next.argtypes = [C.c_void_p, f32p,
                                   C.POINTER(C.c_double)]
    lib.rn_loader_close.argtypes = [C.c_void_p]

    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


# ---------------------------------------------------------------------------
# Pythonic wrappers
# ---------------------------------------------------------------------------


def crc16(data: bytes) -> int:
    lib = load_native()
    return int(lib.rn_crc16(data, len(data)))


def net_keyline_size() -> int:
    """Byte size of one quantized keyline wire record."""
    lib = load_native()
    return int(lib.rn_net_keyline_size())


class UdpPort:
    """Fragmented UDP transport (lossy telemetry semantics)."""

    def __init__(self, host: str, port: int, bind: bool = False):
        self._lib = load_native()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.rn_udp_create(host.encode(), port, int(bind))
        if not self._h:
            raise OSError(f"udp_port create failed for {host}:{port}")

    def send(self, data: bytes) -> int:
        return self._lib.rn_udp_send_fragmented(self._h, data, len(data))

    def recv(self, max_size: int = 1 << 22, timeout_ms: int = 1000
             ) -> Optional[bytes]:
        buf = C.create_string_buffer(max_size)
        n = self._lib.rn_udp_recv_fragmented(self._h, buf, max_size,
                                             timeout_ms)
        if n <= 0:
            return None
        return buf.raw[:n]

    def close(self):
        if self._h:
            self._lib.rn_udp_destroy(self._h)
            self._h = None


def quantize_keylines(klm, k_scale: float):
    """Quantize a KeylineMap (host numpy views) into the wire format.

    Returns (records bytes, count)."""
    lib = load_native()
    K = int(np.asarray(klm.valid).shape[0])
    rec_size = int(lib.rn_net_keyline_size())
    out = np.zeros(K * rec_size, np.uint8)
    id_map = np.zeros(K, np.int32)
    a32 = lambda v: np.ascontiguousarray(np.asarray(v), np.float32)
    i32 = lambda v: np.ascontiguousarray(np.asarray(v), np.int32)
    n = lib.rn_quantize_keylines(
        a32(klm.x), a32(klm.y), a32(klm.gx), a32(klm.gy), a32(klm.n_m),
        a32(klm.rho), a32(klm.s_rho), i32(klm.n_id), i32(klm.m_num),
        np.ascontiguousarray(np.asarray(klm.valid), np.uint8),
        K, float(k_scale), out, id_map)
    return out[:n * rec_size].tobytes(), n


def dequantize_keylines(data: bytes, k_scale: float):
    lib = load_native()
    rec_size = int(lib.rn_net_keyline_size())
    n = len(data) // rec_size
    buf = np.frombuffer(data, np.uint8).copy()
    x = np.zeros(n, np.float32)
    y = np.zeros(n, np.float32)
    rho = np.zeros(n, np.float32)
    s_rho = np.zeros(n, np.float32)
    n_id = np.zeros(n, np.int32)
    m_num = np.zeros(n, np.int32)
    gx = np.zeros(n, np.float32)
    gy = np.zeros(n, np.float32)
    lib.rn_dequantize_keylines(buf, n, float(k_scale), x, y, rho, s_rho,
                               n_id, m_num, gx, gy)
    return dict(x=x, y=y, rho=rho, s_rho=s_rho, n_id=n_id, m_num=m_num,
                gx=gx, gy=gy)


class NativeFrameLoader:
    """Prefetching dataset loader (decode thread + pipeline ring)."""

    def __init__(self, csv_path: str, img_dir: str, width: int, height: int,
                 time_scale: float = 1e-9, nbuf: int = 4):
        self._lib = load_native()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.rn_loader_open(
            csv_path.encode(), img_dir.encode(), time_scale, width, height,
            nbuf)
        if not self._h:
            raise OSError(f"loader open failed: {csv_path}")
        self.width = width
        self.height = height

    def __len__(self):
        return int(self._lib.rn_loader_count(self._h))

    def __iter__(self):
        out = np.zeros((self.height, self.width), np.float32)
        t = C.c_double()
        while True:
            r = self._lib.rn_loader_next(self._h, out, C.byref(t))
            if r == 0:
                break
            if r < 0:
                continue            # decode failure: skip frame
            yield float(t.value), out.copy()

    def close(self):
        if self._h:
            self._lib.rn_loader_close(self._h)
            self._h = None
