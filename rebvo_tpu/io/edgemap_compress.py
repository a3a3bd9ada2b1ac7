"""Compressed edge-map channel: chain -> 3-D line-segment compression.

Functional replacement for the reference's edgemap_com
(src/CommLib/edgemap_com.cpp:168-330): edge chains are walked, split
into runs, robust-fitted as 3-D segments in (x, y, inverse depth) space
and transmitted as quantized endpoints — an order-of-magnitude smaller
than the per-keyline format, for bandwidth-limited telemetry (the MAV
teleoperation path). Packets carry a CRC16 like the reference.

Wire record (10 bytes per endpoint, 2 endpoints per segment):
    u16 x*8, u16 y*8     endpoint position (1/8 px)
    u16 rho_q            inverse depth * (10000/k)
    u16 s_rho_q          uncertainty    * (10000/k)
    u16 reserved
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from rebvo_tpu.core.linefitting import robust_fit_segment_3d

_SEG = struct.Struct("<10H")     # two endpoints, 5 u16 each
_HDR = struct.Struct("<IIfHH")   # magic, nseg, k_scale, crc, reserved
_MAGIC = 0x52564345              # 'RVCE'

MAX_RUN = 24                     # points per fitted segment
MIN_RUN = 3


def _walk_chains(n_id: np.ndarray, p_id: np.ndarray,
                 valid: np.ndarray) -> List[np.ndarray]:
    """Extract chains (lists of keyline indices) following n_id links."""
    K = n_id.shape[0]
    visited = np.zeros(K, bool)
    heads = np.where(valid & ((p_id < 0) | ~valid[np.clip(p_id, 0, K - 1)]))[0]
    chains = []
    for h in heads:
        if visited[h]:
            continue
        chain = []
        i = h
        while i >= 0 and not visited[i] and valid[i]:
            visited[i] = True
            chain.append(i)
            i = n_id[i]
        if len(chain) >= MIN_RUN:
            chains.append(np.asarray(chain))
    return chains


def compress_edgemap(klm, k_scale: float) -> bytes:
    """Fit chain runs into segments and pack them with a CRC."""
    valid = np.asarray(klm.valid)
    x = np.asarray(klm.x, np.float64)
    y = np.asarray(klm.y, np.float64)
    rho = np.asarray(klm.rho, np.float64)
    s_rho = np.asarray(klm.s_rho, np.float64)
    n_id = np.asarray(klm.n_id)
    p_id = np.asarray(klm.p_id)

    rs = 10000.0 / max(k_scale, 1e-9)
    q16 = lambda v: int(np.clip(round(v), 0, 65535))

    recs = []
    for chain in _walk_chains(n_id, p_id, valid):
        for s in range(0, len(chain) - MIN_RUN + 1, MAX_RUN):
            run = chain[s:s + MAX_RUN]
            if run.size < MIN_RUN:
                break
            seg, _ = robust_fit_segment_3d(
                x[run][None], y[run][None], rho[run][None],
                s_rho[run][None], sigma_thresh=2.0)
            p0 = seg.p0[0]
            p1 = seg.p1[0]
            s_mean = float(np.mean(s_rho[run]))
            recs.append(_SEG.pack(
                q16(p0[0] * 8), q16(p0[1] * 8), q16(p0[2] * rs),
                q16(s_mean * rs), 0,
                q16(p1[0] * 8), q16(p1[1] * 8), q16(p1[2] * rs),
                q16(s_mean * rs), 0))
    payload = b"".join(recs)
    from rebvo_tpu.io import native
    crc = native.crc16(payload) if native.native_available() else 0
    hdr = _HDR.pack(_MAGIC, len(recs), float(k_scale), crc, 0)
    return hdr + payload


def decompress_edgemap(data: bytes) -> Optional[dict]:
    if len(data) < _HDR.size:
        return None
    magic, nseg, k_scale, crc, _ = _HDR.unpack_from(data)
    if magic != _MAGIC:
        return None
    payload = data[_HDR.size:]
    from rebvo_tpu.io import native
    if native.native_available() and crc and native.crc16(payload) != crc:
        return None
    rs = max(k_scale, 1e-9) / 10000.0
    segs = []
    for i in range(nseg):
        vals = _SEG.unpack_from(payload, i * _SEG.size)
        p0 = (vals[0] / 8.0, vals[1] / 8.0, vals[2] * rs, vals[3] * rs)
        p1 = (vals[5] / 8.0, vals[6] / 8.0, vals[7] * rs, vals[8] * rs)
        segs.append((p0, p1))
    return dict(k_scale=k_scale, segments=segs)
