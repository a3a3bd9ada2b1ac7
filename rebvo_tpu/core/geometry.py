"""Geometry primitives: SO(3), pinhole camera with radial-tangential
distortion, batched keyline-coordinate transforms.

Replaces the reference's TooN usage and `cam_model`
(reference include/UtilLib/cam_model.h:33-180, include/UtilLib/toon_util.h)
with pure-jnp functions designed to batch over keyline axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def skew(w: Array) -> Array:
    """Cross-product matrix [w]x (reference toon_util.h:93)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: Array) -> Array:
    """Rodrigues' formula, Taylor-safe near zero (replaces TooN::SO3).

    Gradient-safe at w == 0: sqrt/division operands are sanitised before
    the branch select, so autodiff through the unused branch cannot
    produce inf * 0 = NaN (this function is differentiated at exactly
    zero by the BA and pose-graph Jacobians)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-12
    t2s = jnp.where(small, 1.0, theta2)       # safe operand for sqrt/div
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    K = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: Array) -> Array:
    """Logarithm map of a rotation matrix -> axis-angle vector.

    Numerically robust for angles near 0 and near pi (the reference relies
    on TooN::SO3::ln()).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Antisymmetric part -> axis*sin(theta)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-6
    # theta/(2 sin theta), -> 1/2 as theta -> 0
    scale_small = 0.5 + theta * theta / 12.0
    scale = jnp.where(small, scale_small, theta / jnp.where(small, 1.0, 2.0 * sin_t))

    w_generic = v * scale[..., None]

    # Near pi: use the diagonal. R = I + 2/theta^2 * K^2 approx -> extract axis
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / jnp.where(jnp.abs(1.0 - cos_t[..., None]) < 1e-12, 1.0, 1.0 - cos_t[..., None]), 0.0, None)
    axis_abs = jnp.sqrt(axis2)
    # signs from the off-diagonal symmetric part
    sx = jnp.sign(jnp.where(jnp.abs(v[..., 0]) > 1e-9, v[..., 0], 1.0))
    sy = jnp.sign(R[..., 0, 1] + R[..., 1, 0]) * sx
    sz = jnp.sign(R[..., 0, 2] + R[..., 2, 0]) * sx
    axis = axis_abs * jnp.stack([sx, sy, sz], axis=-1)
    nrm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.where(nrm < 1e-12, 1.0, nrm)
    w_pi = axis * theta[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def rotation_to_quaternion(R: Array) -> Array:
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order."""
    w = so3_log(R)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    axis = w / jnp.where(theta < 1e-12, 1.0, theta)
    half = 0.5 * theta
    xyz = axis * jnp.sin(half)
    qw = jnp.cos(half)[..., 0]
    return jnp.concatenate([xyz, qw[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Camera model
# ---------------------------------------------------------------------------


class CameraModel(NamedTuple):
    """Pinhole camera with radial-tangential distortion.

    Mirrors the reference `cam_model` (cam_model.h:33): `zfm` is the mean
    focal length used by all VO math; homogeneous ("Hom") coordinates are
    principal-point-subtracted pixel coordinates on the zfm focal plane.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    zfm: float          # mean focal length
    kc2: float
    kc4: float
    kc6: float
    p1: float
    p2: float
    width: int          # static
    height: int         # static

    @staticmethod
    def make(fx, fy, cx, cy, kc2=0.0, kc4=0.0, kc6=0.0, p1=0.0, p2=0.0,
             width=752, height=480, dtype=jnp.float32) -> "CameraModel":
        # Plain Python floats, NOT jnp scalars: a jitted function that
        # closes over a live device array captures it as a jaxpr constant,
        # and compiling any such program puts this TPU runtime into a
        # permanently degraded mode (~100x on gathers; measured in
        # tools/exp_trigger6.py). Floats become HLO literals instead.
        c = lambda v: float(v)
        return CameraModel(
            fx=c(fx), fy=c(fy), cx=c(cx), cy=c(cy),
            zfm=c(0.5 * (float(fx) + float(fy))),
            kc2=c(kc2), kc4=c(kc4), kc6=c(kc6), p1=c(p1), p2=c(p2),
            width=int(width), height=int(height),
        )

    @staticmethod
    def from_params(params, stereo: bool = False) -> "CameraModel":
        if stereo:
            return CameraModel.make(
                params.StereoZfX, params.StereoZfY, params.StereoPPx,
                params.StereoPPy, params.StereoKcR2, params.StereoKcR4,
                params.StereoKcR6, params.StereoKcP1, params.StereoKcP2,
                params.ImageWidth, params.ImageHeight)
        return CameraModel.make(
            params.ZfX, params.ZfY, params.PPx, params.PPy,
            params.KcR2, params.KcR4, params.KcR6, params.KcP1, params.KcP2,
            params.ImageWidth, params.ImageHeight)

    # -- coordinate changes (cam_model.h:89-110) --

    def hom_to_img(self, hx: Array, hy: Array):
        return hx + self.cx, hy + self.cy

    def img_to_hom(self, ix: Array, iy: Array):
        return ix - self.cx, iy - self.cy

    # -- distortion (cam_model.h:57-87) --

    def distort_hom(self, hx: Array, hy: Array):
        """Ideal hom coords -> distorted hom coords (distortHom2Hom)."""
        xp = hx / self.zfm
        yp = hy / self.zfm
        r2 = xp * xp + yp * yp
        radial = 1.0 + r2 * (self.kc2 + r2 * (self.kc4 + r2 * self.kc6))
        xpp = xp * radial + 2.0 * self.p1 * xp * yp + self.p2 * (r2 + 2.0 * xp * xp)
        ypp = yp * radial + self.p1 * (r2 + 2.0 * yp * yp) + 2.0 * self.p2 * xp * yp
        return xpp * self.fx, ypp * self.fy

    def undistort_hom(self, hx: Array, hy: Array, newton_iters: int = 5):
        """Distorted hom coords -> ideal hom coords via Newton on the radial
        model (undistortHom2Hom, cam_model.h:57-73; tangential terms are
        ignored there too)."""
        rd = jnp.sqrt((hx / self.fx) ** 2 + (hy / self.fy) ** 2)
        rn = rd
        for _ in range(newton_iters):
            f = rn * (1.0 + rn * rn * (self.kc2 + self.kc4 * rn * rn)) - rd
            df = 1.0 + rn * rn * (3.0 * self.kc2 + 5.0 * self.kc4 * rn * rn)
            rn = rn - f / df
        scale = jnp.where(rd > 1e-12, rn / jnp.where(rd > 1e-12, rd, 1.0), 1.0)
        return hx * scale * self.zfm / self.fx, hy * scale * self.zfm / self.fy

    # -- projection (cam_model.h:143-178); "I3P" = (x_img_hom, y_img_hom, inv_depth)

    def unproject_i3p(self, px: Array, py: Array, rho: Array):
        """(hom x, hom y, inverse depth) -> 3D point.

        Matches Ne10::ProyI3Pto3PMatrix (ne10wrapper.h:415-425).
        """
        z = 1.0 / rho
        return px * z / self.zfm, py * z / self.zfm, z

    def project_i3p(self, X: Array, Y: Array, Z: Array):
        """3D point -> (hom x, hom y, inverse depth).

        Matches Ne10::ProyP3toI3PMatrix (ne10wrapper.h:430-447).
        """
        rho = 1.0 / Z
        return X * self.zfm * rho, Y * self.zfm * rho, rho


# ---------------------------------------------------------------------------
# Batched keyline transforms
# ---------------------------------------------------------------------------


def rotate_hom_points(R: Array, px: Array, py: Array, rho: Array,
                      s_rho: Array, zfm: Array):
    """Rotate homogeneous keyline positions + inverse depth by R.

    Semantics of edge_tracker::rotate_keylines (edge_tracker.cpp:42-76):
    q = R @ (px/zf, py/zf, 1); then p' = q.xy/q.z*zf, rho' = rho/q.z,
    s_rho' = s_rho/q.z; guarded when |q.z| == 0.
    """
    qx = R[0, 0] * px / zfm + R[0, 1] * py / zfm + R[0, 2]
    qy = R[1, 0] * px / zfm + R[1, 1] * py / zfm + R[1, 2]
    qz = R[2, 0] * px / zfm + R[2, 1] * py / zfm + R[2, 2]
    ok = jnp.abs(qz) > 0
    safe_qz = jnp.where(ok, qz, 1.0)
    px2 = jnp.where(ok, qx / safe_qz * zfm, px)
    py2 = jnp.where(ok, qy / safe_qz * zfm, py)
    rho2 = jnp.where(ok, rho / safe_qz, rho)
    s_rho2 = jnp.where(ok, s_rho / safe_qz, s_rho)
    return px2, py2, rho2, s_rho2


def rotate_gradients(R: Array, gx: Array, gy: Array):
    """Rotate keyline gradients: (gx', gy') = (R @ (gx, gy, 0)).xy
    (the reference's 'nasty rotation of the keyline tangent',
    edge_tracker.cpp:66-71)."""
    gx2 = R[0, 0] * gx + R[0, 1] * gy
    gy2 = R[1, 0] * gx + R[1, 1] * gy
    return gx2, gy2
