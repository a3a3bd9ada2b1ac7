"""Per-frame state logging.

Replaces the reference's third-thread `.m` Matlab log (reference
src/rebvo/rebvo_third_t.cpp:259-313: ~30 per-frame arrays buffered in
RAM and written at exit) and the TUM trajectory file. The log schema
keeps the reference's array names where a direct counterpart exists so
existing analysis scripts (app/rebvorun/rebvo_log.m) can be adapted.

Like the reference (which buffers in RAM and writes at exit), `push` is
asynchronous: it only holds a reference to the device output pytree, so
pushing never forces a device sync and the jitted steps stay pipelined.
Host conversion happens lazily on first access to `rows` (or at write
time) — one bulk transfer per drain instead of ~15 blocking `float()`
calls per frame.
"""

from __future__ import annotations

from typing import List

import numpy as np

from rebvo_tpu.io.trajectory import write_tum


class RunLogger:
    """Accumulates FrameOutput records; converts to host lazily."""

    def __init__(self):
        self._pending: List = []   # device FrameOutputs, not yet converted
        self._rows: List[dict] = []

    def push(self, out) -> None:
        """Record one FrameOutput. No host sync: the device arrays are
        retained and materialised in bulk later."""
        self._pending.append(out)

    def _drain(self) -> None:
        if not self._pending:
            return
        import jax
        outs = jax.device_get(self._pending)   # one bulk transfer
        self._pending = []
        for out in outs:
            nav = out.nav
            self._rows.append(dict(
                t=float(nav.t), dt=float(nav.dt),
                RotLie=np.asarray(nav.RotLie),
                Vel=np.asarray(nav.Vel),
                PoseLie=np.asarray(nav.PoseLie),
                Pos=np.asarray(nav.Pos),
                Pose=np.asarray(nav.Pose),
                g=np.asarray(nav.g),
                scale=float(nav.scale),
                ok=bool(nav.estimation_ok),
                kl_num=int(nav.kl_num),
                klm_num=int(nav.klm_num),
                s_rho_q=float(out.s_rho_q),
                score=float(out.score),
                stereo_num=int(getattr(out, "stereo_num", 0)),
            ))

    @property
    def rows(self) -> List[dict]:
        self._drain()
        return self._rows

    @staticmethod
    def from_device_log(navlog, navlog_n) -> "RunLogger":
        """Build a logger from a VOState's device-resident nav-log ring
        (frontend/step.py NAVLOG_*): ONE bulk device transfer for the
        whole run. This is the throughput path — on the target runtime a
        D2H fetch issued between steps costs seconds and permanently
        degrades the process (see bench.py's runtime-health notes), so
        apps log on device and fetch once at the end."""
        import jax
        import jax.numpy as jnp

        from rebvo_tpu.core.geometry import so3_exp
        from rebvo_tpu.frontend.step import unpack_nav_rows
        n = int(navlog_n)
        cap = navlog.shape[0]
        host = np.asarray(navlog)                # one transfer
        if n <= cap:
            host = host[:n]
        else:                                    # ring wrapped: oldest first
            k = n % cap
            host = np.concatenate([host[k:], host[:k]])
        lg = RunLogger()
        lg._rows = unpack_nav_rows(host)
        if lg._rows:
            PL = jnp.asarray(np.stack([r["PoseLie"] for r in lg._rows]))
            Poses = np.asarray(jax.vmap(so3_exp)(PL))
            for r, P in zip(lg._rows, Poses):
                r["Pose"] = P
        return lg

    def __len__(self) -> int:
        return len(self._pending) + len(self._rows)

    # -- TUM trajectory (rebvo_third_t.cpp:311) --

    def write_trajectory(self, path: str) -> None:
        import jax
        import jax.numpy as jnp

        from rebvo_tpu.core.geometry import rotation_to_quaternion
        rows = self.rows
        ts = [r["t"] for r in rows]
        pos = np.stack([r["Pos"] for r in rows])
        poses = jnp.asarray(np.stack([r["Pose"] for r in rows]))
        quat = np.asarray(jax.vmap(rotation_to_quaternion)(poses))
        write_tum(path, ts, pos, quat)

    # -- Matlab-format state log (rebvo_third_t.cpp:265-305) --

    def write_mfile(self, path: str) -> None:
        def mat(name, rows):
            arr = np.asarray(rows)
            if arr.ndim == 1:
                arr = arr[:, None]
            lines = ";\n".join(
                " ".join(f"{v:.9g}" for v in np.atleast_1d(row))
                for row in arr)
            return f"{name}=[{lines}];\n"

        rows = self.rows
        with open(path, "w") as fh:
            fh.write(mat("t", [r["t"] for r in rows]))
            fh.write(mat("dt", [r["dt"] for r in rows]))
            fh.write(mat("RotLie", [r["RotLie"] for r in rows]))
            fh.write(mat("Vel", [r["Vel"] for r in rows]))
            fh.write(mat("PoseLie", [r["PoseLie"] for r in rows]))
            fh.write(mat("Pos", [r["Pos"] for r in rows]))
            fh.write(mat("Gest", [r["g"] for r in rows]))
            fh.write(mat("Kscale", [r["scale"] for r in rows]))
            fh.write(mat("EstimationOK", [int(r["ok"]) for r in rows]))
            fh.write(mat("KLnum", [r["kl_num"] for r in rows]))
            fh.write(mat("KLMnum", [r["klm_num"] for r in rows]))
            fh.write(mat("SrhoQ", [r["s_rho_q"] for r in rows]))
            fh.write(mat("Score", [r["score"] for r in rows]))
            fh.write(mat("StereoNum", [r["stereo_num"] for r in rows]))
