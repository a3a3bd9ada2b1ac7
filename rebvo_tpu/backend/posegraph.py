"""Pose graph: measurement log + optimizer.

The reference's pose_graph (reference include/mtracklib/pose_graph.h:
31-131) is an append-only log of per-frame relative-pose measurements
`OdometryMeas` {relPosPose 6-vec, 6x6 information, accel/scale metadata,
KF id} with binary save/load — **no optimizer exists there** (SURVEY.md
§2.3). This module keeps the log (npz-serialised) and adds what the
reference lacks: a batched Gauss-Newton pose-graph optimizer over SE(3)
keyframe poses, jitted with dense fixed-size state (suitable up to a few
hundred nodes; the sharded Schur BA in backend/ba.py covers the larger
problems).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.core.geometry import so3_exp, so3_log

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST


@dataclass
class OdometryMeas:
    """One frame-to-frame measurement (pose_graph.h:31-85)."""

    rel_pose: np.ndarray          # [6] translation + rotation (Lie)
    W: np.ndarray                 # [6,6] information
    acel_s: np.ndarray = None
    acel_v: np.ndarray = None
    g_est: np.ndarray = None
    K: float = 1.0
    WK: float = 0.0
    QK: float = 0.0
    kf_id: int = -1


@dataclass
class PoseGraphLog:
    """Append-only measurement log (the reference's `poses`,
    rebvo.h:437)."""

    meas: List[OdometryMeas] = field(default_factory=list)

    def add_frame_meas(self, m: OdometryMeas) -> None:
        self.meas.append(m)

    def save(self, path: str) -> None:
        n = len(self.meas)
        z = dict(
            rel_pose=np.stack([m.rel_pose for m in self.meas]) if n else
            np.zeros((0, 6)),
            W=np.stack([m.W for m in self.meas]) if n else np.zeros((0, 6, 6)),
            K=np.asarray([m.K for m in self.meas]),
            WK=np.asarray([m.WK for m in self.meas]),
            QK=np.asarray([m.QK for m in self.meas]),
            kf_id=np.asarray([m.kf_id for m in self.meas], np.int64),
        )
        np.savez_compressed(path, **z)

    @staticmethod
    def load(path: str) -> "PoseGraphLog":
        z = np.load(path)
        log = PoseGraphLog()
        for i in range(z["rel_pose"].shape[0]):
            log.add_frame_meas(OdometryMeas(
                rel_pose=z["rel_pose"][i], W=z["W"][i], K=float(z["K"][i]),
                WK=float(z["WK"][i]), QK=float(z["QK"][i]),
                kf_id=int(z["kf_id"][i])))
        return log


# ---------------------------------------------------------------------------
# Pose-graph optimization (new capability; the reference only logs)
# ---------------------------------------------------------------------------


def problem_from_log(log: "PoseGraphLog", dtype=jnp.float32):
    """Build a chain PoseGraphProblem from a VOSystem pose log.

    Measurement semantics (rebvo_second_t.cpp:326-334 / VOSystem):
    rel_pose = [-R·V ; log(R)] between consecutive frames, with R the
    backward frame rotation — i.e. node i+1 = node i composed with
    (exp(w_ij), t_ij) where t_ij = rel_pose[:3]·K in frame i. The full
    6x6 transported information matrices become the edge weights.
    Returns (problem, n_nodes).
    """
    n = len(log.meas)
    if n == 0:
        raise ValueError("empty pose log")
    t_ij = np.stack([m.rel_pose[:3] * m.K for m in log.meas])
    w_ij = np.stack([m.rel_pose[3:] for m in log.meas])
    info = np.stack([m.W for m in log.meas])
    # symmetrize + floor: pinv transport can leave tiny asymmetries and
    # near-null directions (the rotation block of J_rp_x is exact, the
    # translation block couples V and W)
    info = 0.5 * (info + np.swapaxes(info, 1, 2))
    prob = PoseGraphProblem(
        i=jnp.arange(n, dtype=jnp.int32),
        j=jnp.arange(1, n + 1, dtype=jnp.int32),
        t_ij=jnp.asarray(t_ij, dtype),
        w_ij=jnp.asarray(w_ij, dtype),
        info=jnp.asarray(info, dtype),
        valid=jnp.ones((n,), bool))
    return prob, n + 1


class PoseGraphProblem(NamedTuple):
    """Fixed-size constraint set between N nodes.

    Edge e: nodes (i, j) with measured relative transform (R_ij, t_ij)
    such that ideally: R_j ~ R_i @ R_ij, p_j ~ p_i + R_i @ t_ij.
    """

    i: Array        # [E] int32
    j: Array        # [E] int32
    t_ij: Array     # [E, 3]
    w_ij: Array     # [E, 3] rotation measurement (Lie)
    info: Array     # [E] scalar weight OR [E,6,6] full information
                    # matrices (residual order [t(3); rot(3)]) — the
                    # estimator covariance transported by VOSystem
    valid: Array    # [E] bool


def _so3_residual(R):
    """Smooth rotation residual: 0.5 vee(R - R^T) = sin(theta) axis.

    Equals the Lie log to first order but is differentiable at identity
    (the exact log's arccos has an infinite derivative there, which
    poisons autodiff with NaNs)."""
    return 0.5 * jnp.stack([R[2, 1] - R[1, 2],
                            R[0, 2] - R[2, 0],
                            R[1, 0] - R[0, 1]])


def _edge_residual(Ri, pi, Rj, pj, t_ij, w_ij):
    """6-vector residual of one edge (local frame)."""
    R_ij = so3_exp(w_ij)
    r_rot = _so3_residual(jnp.einsum("ab,ac->bc", Ri @ R_ij, Rj,
                                     precision=_HI))
    r_tr = Ri.T @ (pj - pi) - t_ij
    return jnp.concatenate([r_tr, r_rot])


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(R0: Array, p0: Array, prob: PoseGraphProblem,
                        iters: int = 10, damping: float = 1e-4):
    """Batched GN over all node poses; node 0 is gauge-fixed.

    State: per-node [3] rotation update (left-multiplied) + [3] position.
    The Jacobians use the standard small-angle approximation; residuals
    are recomputed exactly each iteration.
    """
    N = R0.shape[0]
    dt = p0.dtype

    def residuals(R, p):
        Ri = R[prob.i]
        Rj = R[prob.j]
        pi = p[prob.i]
        pj = p[prob.j]
        return jax.vmap(_edge_residual)(Ri, pi, Rj, pj, prob.t_ij,
                                        prob.w_ij)

    def gn_iter(carry, _):
        R, p = carry
        res = residuals(R, p)                     # [E, 6]

        # Jacobians wrt (dw_i, dp_i, dw_j, dp_j) by forward differences on
        # the exact residual via jvp (cheap: 12 tangents per edge, done
        # as one vmapped jacfwd over the 12-dim local edge state).
        def edge_res_local(x, ei):
            dwi = x[0:3]
            dpi = x[3:6]
            dwj = x[6:9]
            dpj = x[9:12]
            Ri = so3_exp(dwi) @ R[prob.i[ei]]
            Rj = so3_exp(dwj) @ R[prob.j[ei]]
            return _edge_residual(Ri, p[prob.i[ei]] + dpi, Rj,
                                  p[prob.j[ei]] + dpj,
                                  prob.t_ij[ei], prob.w_ij[ei])

        zeros12 = jnp.zeros((12,), dt)
        Je = jax.vmap(lambda ei: jax.jacfwd(edge_res_local)(zeros12, ei))(
            jnp.arange(prob.i.shape[0]))          # [E, 6, 12]

        # Edge weights: scalar [E] info broadcasts to w·I6; full [E,6,6]
        # information matrices weight each residual component (and their
        # correlations) by the estimator's actual confidence.
        if prob.info.ndim == 1:
            Wm = (jnp.where(prob.valid, prob.info, 0.0)[:, None, None] *
                  jnp.eye(6, dtype=dt))
        else:
            Wm = jnp.where(prob.valid[:, None, None], prob.info, 0.0)
        # Assemble dense H [6N, 6N], b [6N] by scatter-add.
        Ji = Je[:, :, 0:6]                        # wrt node i (dw, dp)
        Jj = Je[:, :, 6:12]
        Hii = jnp.einsum("eak,eab,ebl->ekl", Ji, Wm, Ji, precision=_HI)
        Hjj = jnp.einsum("eak,eab,ebl->ekl", Jj, Wm, Jj, precision=_HI)
        Hij = jnp.einsum("eak,eab,ebl->ekl", Ji, Wm, Jj, precision=_HI)
        bi = jnp.einsum("eak,eab,eb->ek", Ji, Wm, res, precision=_HI)
        bj = jnp.einsum("eak,eab,eb->ek", Jj, Wm, res, precision=_HI)

        H = jnp.zeros((N, 6, N, 6), dt)
        H = H.at[prob.i, :, prob.i, :].add(Hii)
        H = H.at[prob.j, :, prob.j, :].add(Hjj)
        H = H.at[prob.i, :, prob.j, :].add(Hij)
        H = H.at[prob.j, :, prob.i, :].add(jnp.swapaxes(Hij, 1, 2))
        b = jnp.zeros((N, 6), dt)
        b = b.at[prob.i].add(bi)
        b = b.at[prob.j].add(bj)

        Hd = H.reshape(6 * N, 6 * N)
        bd = b.reshape(6 * N)
        # Gauge fix: clamp node 0 with a strong prior.
        Hd = Hd + jnp.eye(6 * N, dtype=dt) * damping
        Hd = Hd.at[:6, :6].add(jnp.eye(6, dtype=dt) * 1e8)

        dx = jnp.linalg.solve(Hd, -bd).reshape(N, 6)
        dw = dx[:, 0:3]
        dp = dx[:, 3:6]
        R_new = jax.vmap(lambda w_, Rn: so3_exp(w_) @ Rn)(dw, R)
        p_new = p + dp
        cost = jnp.sum(jnp.einsum("ea,eab,eb->e", res, Wm, res,
                                  precision=_HI))
        return (R_new, p_new), cost

    (R, p), costs = jax.lax.scan(gn_iter, (R0, p0), None, length=iters)
    return R, p, costs
