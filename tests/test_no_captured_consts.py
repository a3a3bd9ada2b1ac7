"""Guard: no jitted entry program may close over a live device array.

A jaxpr constant that is a `jax.Array` is compiled into the executable
as a captured buffer. On the target TPU runtime, compiling any such
program permanently degrades every subsequent device execution in the
process by ~100x (gathers especially; root-caused via
tools/exp_trigger6.py: a captured 0-d jnp scalar is enough, while the
same value passed as an argument or as a Python float is fine).

This test traces the hot-path programs and asserts their jaxprs carry
no array constants, so the regression cannot silently return through a
refactor (e.g. CameraModel fields becoming jnp scalars again).
"""

import jax
import jax.numpy as jnp
import pytest

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.imu import ImuWindow
from rebvo_tpu.frontend.step import VOFrontend


@pytest.fixture(scope="module")
def fe():
    params = REBVOParameters().replace(
        ImageWidth=64, ImageHeight=48, PPx=32.0, PPy=24.0,
        ZfX=40.0, ZfY=40.0, KeylineMax=256, MaxPoints=256,
        ReferencePoints=128, TrackPoints=256, SearchRange=8,
        MatchMaxSteps=12)
    return VOFrontend(params)


def captured_arrays(fn, *args):
    closed = jax.make_jaxpr(fn)(*args)
    return [c for c in closed.consts if isinstance(c, jax.Array)]


def test_bootstrap_no_consts(fe):
    state = fe.init()
    frame = jnp.zeros((48, 64), jnp.float32)
    assert captured_arrays(fe.bootstrap_fn, state, frame,
                           jnp.asarray(0.0)) == []


def test_step_no_consts(fe):
    state = fe.init()
    frame = jnp.zeros((48, 64), jnp.float32)
    assert captured_arrays(fe.step_fn, state, frame, jnp.asarray(0.05)) == []


def test_step_imu_no_consts(fe):
    state = fe.init()
    frame = jnp.zeros((48, 64), jnp.float32)
    win = ImuWindow(gyro=jnp.zeros((16, 3)), accel=jnp.zeros((16, 3)),
                    count=jnp.asarray(16, jnp.int32),
                    tsample=jnp.asarray(0.005))
    assert captured_arrays(fe.step_imu_fn, state, frame, jnp.asarray(0.05),
                           win) == []


def test_camera_model_fields_are_floats(fe):
    for name in ("fx", "fy", "cx", "cy", "zfm", "kc2", "kc4", "kc6",
                 "p1", "p2"):
        assert isinstance(getattr(fe.cam, name), float), name
