"""Per-frame state logging.

Replaces the reference's third-thread `.m` Matlab log (reference
src/rebvo/rebvo_third_t.cpp:259-313: ~30 per-frame arrays buffered in
RAM and written at exit) and the TUM trajectory file. The log schema
keeps the reference's array names where a direct counterpart exists so
existing analysis scripts (app/rebvorun/rebvo_log.m) can be adapted.
"""

from __future__ import annotations

from typing import List

import numpy as np

from rebvo_tpu.core.geometry import rotation_to_quaternion
from rebvo_tpu.io.trajectory import write_tum


class RunLogger:
    """Accumulates FrameOutput records and writes logs at the end."""

    def __init__(self):
        self.rows: List[dict] = []

    def push(self, out) -> None:
        nav = out.nav
        self.rows.append(dict(
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
        ))

    # -- TUM trajectory (rebvo_third_t.cpp:311) --

    def write_trajectory(self, path: str) -> None:
        import jax.numpy as jnp
        ts = [r["t"] for r in self.rows]
        pos = np.stack([r["Pos"] for r in self.rows])
        quat = np.stack([
            np.asarray(rotation_to_quaternion(jnp.asarray(r["Pose"])))
            for r in self.rows])
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

        with open(path, "w") as fh:
            fh.write(mat("t", [r["t"] for r in self.rows]))
            fh.write(mat("dt", [r["dt"] for r in self.rows]))
            fh.write(mat("RotLie", [r["RotLie"] for r in self.rows]))
            fh.write(mat("Vel", [r["Vel"] for r in self.rows]))
            fh.write(mat("PoseLie", [r["PoseLie"] for r in self.rows]))
            fh.write(mat("Pos", [r["Pos"] for r in self.rows]))
            fh.write(mat("Gest", [r["g"] for r in self.rows]))
            fh.write(mat("Kscale", [r["scale"] for r in self.rows]))
            fh.write(mat("EstimationOK", [int(r["ok"]) for r in self.rows]))
            fh.write(mat("KLnum", [r["kl_num"] for r in self.rows]))
            fh.write(mat("KLMnum", [r["klm_num"] for r in self.rows]))
            fh.write(mat("SrhoQ", [r["s_rho_q"] for r in self.rows]))
            fh.write(mat("Score", [r["score"] for r in self.rows]))
