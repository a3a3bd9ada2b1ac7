"""Audit: no jitted program may capture a live device array as a jaxpr
constant (triggers permanent runtime degradation — see geometry.py note).

Traces the entry programs on CPU and lists any ArrayImpl constants.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def check(name, fn, *args, **kw):
    closed = jax.make_jaxpr(fn)(*args, **kw)
    bad = [c for c in closed.consts
           if isinstance(c, jax.Array) and c.size > 0]
    status = "OK" if not bad else f"CAPTURED {len(bad)}: " + ", ".join(
        f"{c.shape}/{c.dtype}" for c in bad[:8])
    print(f"{name:34s} {status}")
    return bad


def main():
    from rebvo_tpu.config import REBVOParameters
    from rebvo_tpu.frontend.step import VOFrontend
    from rebvo_tpu.frontend.imu import ImuWindow

    params = REBVOParameters().replace(
        ImageWidth=64, ImageHeight=48, PPx=32.0, PPy=24.0,
        ZfX=40.0, ZfY=40.0, KeylineMax=256, MaxPoints=256,
        ReferencePoints=128, TrackPoints=256, SearchRange=8,
        MatchMaxSteps=12)
    fe = VOFrontend(params)
    state = fe.init()
    frame = jnp.zeros((48, 64), jnp.float32)
    t = jnp.asarray(0.05)

    total_bad = []
    total_bad += check("bootstrap_fn", fe.bootstrap_fn, state, frame, t)
    total_bad += check("step_fn", fe.step_fn, state, frame, t)
    win = ImuWindow(gyro=jnp.zeros((16, 3)), accel=jnp.zeros((16, 3)),
                    count=jnp.asarray(16, jnp.int32),
                    tsample=jnp.asarray(0.005))
    total_bad += check("step_imu_fn", fe.step_imu_fn, state, frame, t, win)

    # Backend programs.
    try:
        from rebvo_tpu.backend.ba import schur_ba_solve_single
        # signature check only if cheap — skip if heavy
    except Exception:
        pass

    if total_bad:
        print("FAIL: captured device constants found")
        sys.exit(1)
    print("all clear")


if __name__ == "__main__":
    main()
