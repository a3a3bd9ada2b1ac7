"""State pytrees for the VO front end.

The reference keeps keylines as an array-of-structs (`KeyLine`,
reference include/mtracklib/edge_finder.h:45-91) sized KEYLINE_MAX with a
live count `kn`. TPU-first, that becomes a fixed-size structure-of-arrays
pytree (`KeylineMap`) with a validity mask — every per-keyline stage is a
masked vectorised op over the full batch, the direct analogue of the
reference's NE10 "LTCV" layout (ne10wrapper.h) but on the VPU/MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Inverse-depth limits and init point (edge_finder.h:38-43).
RHO_MAX = 20.0
RHO_MIN = 1e-3
RHO_INIT = 1.0

# f32-safe stand-in for the reference's 1e50 "infinite variance" priors.
BIG = 1e18


class KeylineMap(NamedTuple):
    """Fixed-size masked SoA of keylines; all arrays have shape [..., K]."""

    valid: Array    # bool — slot holds a detected keyline
    x: Array        # subpixel image coords (KeyLine::c_p)
    y: Array
    gx: Array       # DoG gradient (KeyLine::m_m)
    gy: Array
    n_m: Array      # |m_m|
    ux: Array       # m_m / n_m (KeyLine::u_m)
    uy: Array
    px: Array       # homogeneous coords (KeyLine::p_m)
    py: Array
    p0x: Array      # matched keyline's hom coords (KeyLine::p_m_0)
    p0y: Array
    g0x: Array      # matched keyline's gradient (KeyLine::m_m0)
    g0y: Array
    n_m0: Array     # |m_m0|
    rho: Array      # inverse depth estimate
    s_rho: Array    # inverse depth uncertainty
    rho0: Array     # EKF-predicted inverse depth (KeyLine::rho0)
    s_rho0: Array
    m_num: Array    # int32 — consecutive-match count
    m_id: Array     # int32 — backward match id (-1 = none)
    m_id_f: Array   # int32 — forward match id (set by the pose minimiser)
    m_id_kf: Array  # int32 — match id in the last keyframe
    p_id: Array     # int32 — previous keyline on the edge chain
    n_id: Array     # int32 — next keyline on the chain
    anchored: Array  # bool — depth was pair-anchored at the last stereo
                     # fusion (stereo mode only; always False in mono).
                     # The pose solver restricts its COST vote to these
                     # when enough exist: mono-EKF depths co-adapt to
                     # whatever velocity gauge the solver last produced,
                     # so letting them vote lets a shrunken-V /
                     # inflated-rho fixed point veto the metric motion
                     # the pair-anchored depths demand.
    rho_st: Array    # PURE pair-geometry inverse depth at the last
                     # stereo fusion (0 = none). Unlike the fused `rho`
                     # (which leans on the converged mono sigma and so
                     # inherits any mono gauge error), this is a prior-
                     # independent metric measurement — the right
                     # regressor for the velocity-scale refinement.
    ax: Array        # hom position at the last scale-anchor epoch
    ay: Array        #   (stereo long-baseline scale observer; cloned
                     #   through matching so it follows the keyline's
                     #   identity across frames)
    arho: Array      # pair-geometry rho at the anchor epoch (0 = no
                     #   anchor). Over StereoScaleBaseFrames frames the
                     #   accumulated displacement is several px, far
                     #   above the matcher's ~0.15 px noise floor, so
                     #   the translation scale becomes observable even
                     #   when per-frame motion is sub-pixel.

    @property
    def K(self) -> int:
        return self.valid.shape[-1]

    @property
    def count(self) -> Array:
        return jnp.sum(self.valid, axis=-1).astype(jnp.int32)

    @staticmethod
    def empty(K: int, dtype=jnp.float32, batch_shape=()) -> "KeylineMap":
        f = lambda fill=0.0: jnp.full(batch_shape + (K,), fill, dtype=dtype)
        i = lambda fill=-1: jnp.full(batch_shape + (K,), fill, dtype=jnp.int32)
        return KeylineMap(
            valid=jnp.zeros(batch_shape + (K,), dtype=bool),
            x=f(), y=f(), gx=f(), gy=f(), n_m=f(1.0), ux=f(), uy=f(),
            px=f(), py=f(), p0x=f(), p0y=f(), g0x=f(), g0y=f(), n_m0=f(1.0),
            rho=f(RHO_INIT), s_rho=f(RHO_MAX), rho0=f(RHO_INIT),
            s_rho0=f(RHO_MAX),
            m_num=i(0), m_id=i(), m_id_f=i(), m_id_kf=i(), p_id=i(), n_id=i(),
            anchored=jnp.zeros(batch_shape + (K,), dtype=bool),
            rho_st=f(0.0), ax=f(0.0), ay=f(0.0), arho=f(0.0),
        )


class NavData(NamedTuple):
    """Per-frame navigation output (reference rebvo.h:292-308)."""

    t: Array
    dt: Array
    Rot: Array        # frame-to-frame rotation (backward)
    RotLie: Array
    Vel: Array        # scaled velocity estimate (-V*K/dt)
    Pose: Array       # global rotation [3,3]
    PoseLie: Array
    Pos: Array        # global position [3]
    g: Array          # gravity estimate in camera frame
    scale: Array      # visual-to-metric scale K
    estimation_ok: Array
    kl_num: Array     # detected keylines this frame
    klm_num: Array    # matched keylines this frame
