"""Synthetic edge-map generators shared by tracker tests.

Builds keyline maps directly from 3D line segments with known geometry,
bypassing the detector — lets the matching/minimisation kernels be
tested against exact ground truth.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rebvo_tpu.frontend.state import KeylineMap


def lines_scene(n_lines=12, pts_per_line=160, seed=0, depth_range=(2.0, 8.0)):
    """3D points along straight segments with per-point image-plane
    normal directions. Returns (P [N,3], normal_angle [N]).

    pts_per_line keeps projected keylines <~1px apart, like the real
    detector's contiguous chains — sparser spacing leaves sub-pixel gaps
    between the match field's normal rays and spurious lookup misses."""
    rng = np.random.RandomState(seed)
    pts = []
    normals = []
    for i in range(n_lines):
        z = rng.uniform(*depth_range)
        # segment center and direction in the z-plane
        c = np.array([rng.uniform(-0.6, 0.6), rng.uniform(-0.4, 0.4), z])
        ang = rng.uniform(0, np.pi)
        d = np.array([np.cos(ang), np.sin(ang), 0.0])
        ts = np.linspace(-0.3, 0.3, pts_per_line)
        for t in ts:
            pts.append(c + t * d)
            normals.append(ang + np.pi / 2)  # normal perpendicular to line
    return np.asarray(pts), np.asarray(normals)


def project_points(P, zfm):
    """3D -> (hom x, hom y, rho)."""
    rho = 1.0 / P[:, 2]
    return P[:, 0] * zfm * rho, P[:, 1] * zfm * rho, rho


def make_map(P, normal_angle, zfm, cx, cy, K, s_rho=0.05, m_num=10,
             grad_mag=100.0):
    """KeylineMap from 3D points: projected positions + synthetic
    gradients of magnitude `grad_mag` along the given normals."""
    n = P.shape[0]
    assert n <= K
    px, py, rho = project_points(P, zfm)
    gx = grad_mag * np.cos(normal_angle)
    gy = grad_mag * np.sin(normal_angle)
    n_m = np.full(n, grad_mag)

    pad = lambda a, fill=0.0: np.concatenate(
        [a, np.full(K - n, fill, dtype=np.float64)]).astype(np.float32)
    padi = lambda a, fill=-1: np.concatenate(
        [a, np.full(K - n, fill)]).astype(np.int32)

    klm = KeylineMap.empty(K)
    return klm._replace(
        valid=jnp.asarray(np.arange(K) < n),
        x=jnp.asarray(pad(px + cx)), y=jnp.asarray(pad(py + cy)),
        gx=jnp.asarray(pad(gx)), gy=jnp.asarray(pad(gy)),
        n_m=jnp.asarray(pad(n_m, 1.0)),
        ux=jnp.asarray(pad(gx / n_m)), uy=jnp.asarray(pad(gy / n_m)),
        px=jnp.asarray(pad(px)), py=jnp.asarray(pad(py)),
        p0x=jnp.asarray(pad(px)), p0y=jnp.asarray(pad(py)),
        g0x=jnp.asarray(pad(gx)), g0y=jnp.asarray(pad(gy)),
        n_m0=jnp.asarray(pad(n_m, 1.0)),
        rho=jnp.asarray(pad(rho, 1.0)),
        s_rho=jnp.asarray(pad(np.full(n, s_rho), 20.0)),
        rho0=jnp.asarray(pad(rho, 1.0)),
        s_rho0=jnp.asarray(pad(np.full(n, s_rho), 20.0)),
        m_num=padi(np.full(n, m_num), 0) * jnp.ones((), jnp.int32),
    )._replace(m_num=jnp.asarray(padi(np.full(n, m_num), 0)))


def transform_points(P, R, V):
    return (R @ P.T).T + V
