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
        self._pending: List = []   # (FrameOutput, (tp0, tp1, tp2)) pairs
        self._rows: List[dict] = []

    def push(self, out, tproc=(0.0, 0.0, 0.0)) -> None:
        """Record one FrameOutput. No host sync: the device arrays are
        retained and materialised in bulk later. `tproc` carries the
        host-side per-frame stage times (prep, step dispatch, output) —
        the reference's dtp0/dtp1/TProc2 (rebvo_third_t.cpp:303-305)."""
        self._pending.append((out, tproc))

    def _drain(self) -> None:
        if not self._pending:
            return
        import jax
        outs = jax.device_get([o for o, _ in self._pending])
        tprocs = [tp for _, tp in self._pending]
        self._pending = []
        for out, tp in zip(outs, tprocs):
            nav = out.nav
            self._rows.append(dict(
                t=float(nav.t), dt=float(nav.dt),
                RotLie=np.asarray(nav.RotLie),
                Vel=np.asarray(nav.Vel),
                PoseLie=np.asarray(nav.PoseLie),
                Pos=np.asarray(nav.Pos),
                Pose=np.asarray(nav.Pose),
                Rot=np.asarray(nav.Rot),
                g=np.asarray(nav.g),
                scale=float(nav.scale),
                ok=bool(nav.estimation_ok),
                kl_num=int(nav.kl_num),
                klm_num=int(nav.klm_num),
                s_rho_q=float(out.s_rho_q),
                score=float(out.score),
                stereo_num=int(getattr(out, "stereo_num", 0)),
                Kp=float(getattr(out, "Kp", 1.0)),
                RKp=float(getattr(out, "RKp", 0.0)),
                imu_dbg=np.asarray(getattr(out, "imu_dbg",
                                           np.zeros((11, 3)))),
                tproc=tuple(tp),
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
            RL = jnp.asarray(np.stack([r["RotLie"] for r in lg._rows]))
            Rots = np.asarray(jax.vmap(so3_exp)(RL))
            for r, P, R in zip(lg._rows, Poses, Rots):
                r["Pose"] = P
                r["Rot"] = R
                r["tproc"] = (0.0, 0.0, 0.0)   # device-ring path has no
                                               # host stage times
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
            # keyframe-tracking diagnostics (no reference counterpart:
            # its TrackKeyFrames block logs nothing)
            fh.write(mat("KFId", [r.get("kf_id", -1) for r in rows]))
            fh.write(mat("KFBackM", [r.get("kf_back_m", 0) for r in rows]))
            fh.write(mat("KFSaved", [int(r.get("kf_saved", 0))
                                     for r in rows]))
            self._write_reference_census(fh, rows)

    def _write_reference_census(self, fh, rows) -> None:
        """Emit the reference's exact per-frame `*_cv` assignment
        statements (rebvo_third_t.cpp:259-305) so a rebvo_log.m from
        either system loads in the same analysis script. IMU-state
        arrays are zeros in mono mode, as in the reference."""
        def v3(x):
            return f"[{x[0]:.9g},{x[1]:.9g},{x[2]:.9g}]"

        def m33(M):
            return ("[" + ";".join(
                ",".join(f"{M[a, b]:.9g}" for b in range(3))
                for a in range(3)) + "]")

        dbg_row = {"giro": 0, "acel": 1, "cacel": 2, "dgiro": 3,
                   "GBias": 4, "dWv": 5, "dWgv": 6, "VBias": 7,
                   "Av": 8, "As": 9, "Posgv": 10}
        for i, r in enumerate(rows, start=1):
            d = r.get("imu_dbg", np.zeros((11, 3)))
            tp = r.get("tproc", (0.0, 0.0, 0.0))
            fh.write(f"Kp_cv({i},:)={r.get('Kp', 1.0):.9g};\n")
            fh.write(f"RKp_cv({i},:)={r.get('RKp', 0.0):.9g};\n")
            fh.write(f"Rot_cv({i},:,:)={m33(r['Rot'])};\n")
            fh.write(f"Vel_cv({i},:)={v3(r['Vel'])};\n")
            fh.write(f"RotGiro_cv({i},:)={v3(d[dbg_row['giro']])};\n")
            fh.write(f"t_cv({i},:)={r['t']:.9g};\n")
            fh.write(f"dt_cv({i},:)={r['dt']:.9g};\n")
            fh.write(f"i_cv({i},:)={i};\n")
            fh.write(f"Pose_cv({i},:,:)={m33(r['Pose'])};\n")
            fh.write(f"Pos_cv({i},:)={v3(r['Pos'])};\n")
            fh.write(f"K_cv({i},:)={r['scale']:.9g};\n")
            fh.write(f"KLN_cv({i},:)={r['kl_num']};\n")
            fh.write(f"Giro_cv({i},:)={v3(d[dbg_row['giro']])};\n")
            fh.write(f"Acel_cv({i},:)={v3(d[dbg_row['acel']])};\n")
            fh.write(f"CAcel_cv({i},:)={v3(d[dbg_row['cacel']])};\n")
            fh.write(f"DGiro_cv({i},:)={v3(d[dbg_row['dgiro']])};\n")
            fh.write(f"GBias_cv({i},:)={v3(d[dbg_row['GBias']])};\n")
            fh.write(f"dWv_cv({i},:)={v3(d[dbg_row['dWv']])};\n")
            fh.write(f"dWgv_cv({i},:)={v3(d[dbg_row['dWgv']])};\n")
            fh.write(f"g_cv({i},:)={v3(r['g'])};\n")
            fh.write(f"VBias_cv({i},:)={v3(d[dbg_row['VBias']])};\n")
            fh.write(f"Av_cv({i},:)={v3(d[dbg_row['Av']])};\n")
            fh.write(f"As_cv({i},:)={v3(d[dbg_row['As']])};\n")
            fh.write(f"Posgv_cv({i},:)={v3(d[dbg_row['Posgv']])};\n")
            fh.write(f"SMM_cv({i},:)={r['stereo_num']};\n")
            fh.write(f"TProc0_cv({i},:)={tp[0]:.9g};\n")
            fh.write(f"TProc1_cv({i},:)={tp[1]:.9g};\n")
            fh.write(f"TProc2_cv({i},:)={tp[2]:.9g};\n")


def read_mfile(path: str) -> dict:
    """Parse a rebvo_log.m from EITHER system into {name: ndarray}.

    One loader for both logs is the round-3 census done-when
    (rebvo_third_t.cpp:259-313 emits per-frame `X_cv(i,:)=...;`
    assignments; write_mfile above emits the same census plus
    whole-array `Name=[...];` blocks). Handles scalar, [a,b,c] vector
    and [r1;r2;r3] matrix right-hand sides.
    """
    import re

    import numpy as np

    txt = open(path).read()
    out: dict = {}
    rows: dict = {}
    for m in re.finditer(
            r"(?m)^\s*(\w+)\((\d+)(?:,:)*\)\s*=\s*(\[[^\]]*\]|[^;]+);",
            txt):
        name, idx, rhs = m.group(1), int(m.group(2)), m.group(3)
        vals = [float(x) for x in
                re.split(r"[,\s;]+", rhs.strip().strip("[]")) if x]
        rows.setdefault(name, {})[idx] = vals
    for name, d in rows.items():
        n = max(d)
        width = max(len(v) for v in d.values())
        arr = np.zeros((n, width))
        for i, v in d.items():
            arr[i - 1, :len(v)] = v
        out[name] = arr
    for m in re.finditer(r"(?ms)^(\w+)=\[(.*?)\];", txt):
        name, body = m.group(1), m.group(2)
        mat = [[float(x) for x in re.split(r"[\s,]+", r.strip()) if x]
               for r in body.split(";") if r.strip()]
        out[name] = np.asarray(mat)
    return out
