"""Raw frame recording and deterministic replay.

The reference builds raw recording into every camera
(VideoCam::PushFrame/RecordNFrames, src/VideoLib/videocam.cpp:101-146)
and replays the resulting file with `simcam` under a simulated clock
(src/VideoLib/simcam.cpp) for time-deterministic runs. Here: a simple
length-prefixed binary format (header + per-frame timestamp and float32
payload) written incrementally, replayed via an iterator, with an
optional paced (wall-clock) mode.
"""

from __future__ import annotations

import struct
import time
from typing import Iterator, Optional, Tuple

import numpy as np

_MAGIC = b"RVSIM01\x00"
_HDR = struct.Struct("<8sII")        # magic, width, height
_FRAME = struct.Struct("<dI")        # t, payload bytes


class FrameRecorder:
    """Append frames to a raw recording file."""

    def __init__(self, path: str, width: int, height: int):
        self.fh = open(path, "wb")
        self.fh.write(_HDR.pack(_MAGIC, width, height))
        self.width = width
        self.height = height
        self.count = 0

    def push(self, t: float, frame) -> None:
        arr = np.ascontiguousarray(np.asarray(frame, np.float32))
        assert arr.shape == (self.height, self.width)
        raw = arr.tobytes()
        self.fh.write(_FRAME.pack(float(t), len(raw)))
        self.fh.write(raw)
        self.count += 1

    def close(self) -> None:
        self.fh.close()


class SimReplay:
    """Replay a recording; with `paced`, sleeps to reproduce the original
    inter-frame timing (the simcam role)."""

    def __init__(self, path: str, paced: bool = False,
                 time_sweep: float = 1.0):
        self.fh = open(path, "rb")
        magic, self.width, self.height = _HDR.unpack(
            self.fh.read(_HDR.size))
        if magic != _MAGIC:
            raise ValueError(f"not a recording: {path}")
        self.paced = paced
        self.time_sweep = time_sweep

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        prev_t: Optional[float] = None
        wall0 = time.perf_counter()
        t0: Optional[float] = None
        while True:
            hdr = self.fh.read(_FRAME.size)
            if len(hdr) < _FRAME.size:
                break
            t, nbytes = _FRAME.unpack(hdr)
            raw = self.fh.read(nbytes)
            frame = np.frombuffer(raw, np.float32).reshape(
                self.height, self.width).copy()
            if self.paced:
                if t0 is None:
                    t0 = t
                target = (t - t0) / self.time_sweep
                sleep = target - (time.perf_counter() - wall0)
                if sleep > 0:
                    time.sleep(sleep)
            prev_t = t
            yield t, frame

    def close(self) -> None:
        self.fh.close()
