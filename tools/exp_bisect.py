"""Bisect which compiled kernel degrades dispatch. Runs one case per
subprocess: measure tiny-add dispatch before and after compiling CASE."""

import subprocess
import sys

CASES = ["none", "scale_space", "detect", "field", "quantile", "minimizer",
         "matching", "depth_chain", "step"]

BODY = r'''
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

def t(fn, *a, n=50):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

tiny = jnp.zeros((8, 128))
add = jax.jit(lambda x: x + 1.0)
before = t(add, tiny)

case = "%CASE%"
from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend, MAX_IMG_VALUE
params = REBVOParameters()
fe = VOFrontend(params)
cam = fe.cam
p = params
state = fe.init()
H, W, K = p.ImageHeight, p.ImageWidth, p.KeylineMax
frame = jnp.zeros((H, W), jnp.float32)

if case == "scale_space":
    from rebvo_tpu.kernels.scale_space import build_scale_space
    jax.jit(lambda f: build_scale_space(f, p.Sigma0, p.KSigma, 3)).lower(frame).compile()
elif case == "detect":
    from rebvo_tpu.kernels.scale_space import build_scale_space
    from rebvo_tpu.kernels.edge_detect import detect_keylines
    ss = jax.eval_shape(lambda f: build_scale_space(f, p.Sigma0, p.KSigma, 3), frame)
    import jax.tree_util as jtu
    ss = jtu.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), ss)
    jax.jit(lambda ss, th: detect_keylines(ss, th, K=K, kl_max=p.MaxPoints,
        win_s=p.DetectorPlaneFitSize, per_hist=p.DetectorPosNegThresh,
        dog_thresh=p.DetectorDoGThresh, max_img_value=MAX_IMG_VALUE,
        cx=cam.cx, cy=cam.cy)).lower(ss, state.thresh).compile()
elif case == "field":
    from rebvo_tpu.kernels.field import build_field
    jax.jit(lambda m, mm: build_field(m, mm, radius=min(p.FieldRadius, p.SearchRange),
        height=H, width=W)).lower(state.klm, state.retuned).compile()
elif case == "quantile":
    from rebvo_tpu.kernels.depth_filter import estimate_quantile
    jax.jit(lambda m: estimate_quantile(m, percentile=p.QCutOffQuantile,
        nbins=p.QCutOffNumBins)).lower(state.klm).compile()
elif case == "minimizer":
    from rebvo_tpu.kernels.pose_solver import FieldView, minimizer_rv
    fv = FieldView.from_map(state.field_img, state.klm)
    jax.jit(lambda V, W0, old, fv, q: minimizer_rv(V, W0, old, fv,
        zfm=cam.zfm, cx=cam.cx, cy=cam.cy, width=W, height=H,
        max_r=jnp.asarray(40.0), match_thresh=p.TrackerMatchThresh,
        max_s_rho=q, match_num_min=jnp.asarray(3, jnp.int32),
        k_huber=p.ReweigthDistance, iter_max=p.TrackerIterNum,
        init_iter=p.TrackerInitIterNum, init_type=p.TrackerInitType)
        ).lower(state.Vel, state.W0, state.klm, fv, jnp.asarray(1.0)).compile()
elif case == "matching":
    from rebvo_tpu.kernels.matching import directed_matching_field
    stride = p.MatchFieldStride
    steps = int(p.SearchRange / stride) + 3
    jax.jit(lambda n, o, f, V, R, B: directed_matching_field(n, o, f, V, R, B,
        zfm=cam.zfm, cx=cam.cx, cy=cam.cy, width=W, height=H,
        max_steps=steps, stride=stride, min_thr_mod=p.MatchThreshModule,
        min_thr_ang=p.MatchThreshAngle, max_radius=float(p.SearchRange),
        loc_uncertainty=p.LocationUncertaintyMatch)).lower(
        state.klm, state.klm, state.field_img, state.Vel,
        jnp.eye(3), jnp.eye(3)).compile()
elif case == "depth_chain":
    from rebvo_tpu.kernels.depth_filter import (depth_ekf,
        estimate_rescaling_opt, regularize_1_iter)
    def chain(m, V):
        pr, _ = regularize_1_iter(m, p.RegularizeThresh)
        pr = depth_ekf(pr, V, cam.zfm, reshape_q_abs=p.ReshapeQAbsolute,
                       loc_uncertainty=p.LocationUncertainty)
        return estimate_rescaling_opt(pr, apply=True)
    jax.jit(chain).lower(state.klm, state.Vel).compile()
elif case == "step":
    jax.jit(fe.step_fn).lower(state, frame, jnp.asarray(0.05)).compile()

after = t(add, tiny)
print(f"{case:14s} before={before:7.3f} ms   after={after:7.3f} ms")
'''

for case in CASES:
    code = BODY.replace("%CASE%", case)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=400)
    out = [l for l in r.stdout.splitlines() if "before=" in l]
    print(out[0] if out else f"{case}: FAILED\n{r.stderr[-500:]}")
