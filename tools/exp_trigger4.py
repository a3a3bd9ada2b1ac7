"""Bisect inside depth_ekf to find the exact trigger construct."""

import subprocess
import sys

BODY = r'''
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N, K, NC = 360960, 16384, 26
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randint(-1, K, size=(N,)).astype(np.int32))
idx = jnp.asarray(rng.randint(0, N, size=(K, NC)).astype(np.int32))
gather = jax.jit(lambda t, i: jnp.sum(t[i]))

def m():
    out = gather(table, idx); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(60): out = gather(table, idx)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 60 * 1e3

before = m()
stage = %STAGE%

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend
from rebvo_tpu.frontend.state import RHO_INIT, RHO_MAX, RHO_MIN
params = REBVOParameters()
fe = VOFrontend(params)
state = fe.init()
klm = state.klm
zfm = fe.cam.zfm
reshape_q_abs = params.ReshapeQAbsolute
loc_uncertainty = params.LocationUncertainty

def ekf_trunc(klm, vel):
    active = klm.valid & (klm.m_id >= 0)
    s_rho_prior = klm.s_rho
    v_rho = klm.s_rho * klm.s_rho
    u_x = klm.g0x / klm.n_m0
    u_y = klm.g0y / klm.n_m0
    Y = u_x * (klm.px - klm.p0x) + u_y * (klm.py - klm.p0y)
    H = u_x * (vel[0] * zfm - vel[2] * klm.p0x) + \
        u_y * (vel[1] * zfm - vel[2] * klm.p0y)
    if stage == 1: return Y, H
    rho_p = 1.0 / (1.0 / klm.rho + vel[2])
    F = 1.0 / (1.0 + klm.rho * vel[2])
    F2 = F * F
    p_p = F2 * v_rho * F2 + reshape_q_abs * reshape_q_abs
    if stage == 2: return rho_p, p_p
    e = Y - H * rho_p
    S = H * p_p * H + loc_uncertainty * loc_uncertainty
    Kk = p_p * H / S
    rho_new = rho_p + Kk * e
    s_new = jnp.sqrt((1.0 - Kk * H) * p_p)
    if stage == 3: return rho_new, s_new
    below = rho_new < RHO_MIN
    s_new = jnp.where(below, s_new + (RHO_MIN - rho_new), s_new)
    rho_new = jnp.clip(rho_new, RHO_MIN, RHO_MAX)
    if stage == 4: return rho_new, s_new
    bad = (~jnp.isfinite(rho_new)) | (~jnp.isfinite(s_new)) | (s_new < 0)
    rho_new = jnp.where(bad, RHO_INIT, rho_new)
    s_new = jnp.where(bad, RHO_MAX, s_new)
    if stage == 5: return rho_new, s_new
    return klm._replace(
        rho=jnp.where(active, rho_new, klm.rho),
        s_rho=jnp.where(active, s_new, klm.s_rho),
        rho0=jnp.where(active, rho_p, klm.rho0),
        s_rho0=jnp.where(active, s_rho_prior, klm.s_rho0),
    )

jax.jit(ekf_trunc).lower(klm, jnp.zeros((3,))).compile()
after = m()
print(f"stage={stage}  before={before:7.3f}  after={after:7.3f} ms")
'''

for stage in [1, 2, 3, 4, 5, 6]:
    code = BODY.replace("%STAGE%", str(stage))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"stage {stage}: FAILED\n{r.stderr[-300:]}")
