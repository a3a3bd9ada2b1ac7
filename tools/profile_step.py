"""Per-stage timing of the VO step on the real TPU.

Times each sub-kernel with realistic mid-sequence inputs (state taken
after a few full steps) so gather/scatter densities match production.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.config import REBVOParameters
from rebvo_tpu.frontend.step import VOFrontend, MAX_IMG_VALUE
from rebvo_tpu.kernels.scale_space import build_scale_space
from rebvo_tpu.kernels.edge_detect import (detect_keylines,
                                           re_estimate_thresh,
                                           update_detector_threshold)
from rebvo_tpu.kernels.field import build_field
from rebvo_tpu.kernels.depth_filter import (depth_ekf, estimate_quantile,
                                            estimate_rescaling_opt,
                                            regularize_1_iter)
from rebvo_tpu.kernels.matching import directed_matching_field, forward_match
from rebvo_tpu.kernels.pose_solver import FieldView, minimizer_rv

from bench import synth_frames


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:8.3f} ms")
    return out


def main():
    params = REBVOParameters()
    fe = VOFrontend(params)
    cam = fe.cam
    p = params
    frames = [jnp.asarray(f) for f in synth_frames(params, 4)]

    state = fe.init()
    state = fe.bootstrap(state, frames[0], jnp.asarray(0.0))
    for i in range(3):
        state, out = fe.step(state, frames[i + 1], jnp.asarray(0.05 * (i + 1)))
    jax.block_until_ready(state)
    frame = frames[1]

    print(f"device: {jax.devices()[0]}, image {p.ImageWidth}x{p.ImageHeight}, "
          f"K={p.KeylineMax}")

    # Stage 1: scale space
    ss = timeit("build_scale_space", build_scale_space, frame,
                p.Sigma0, p.KSigma, 3)

    # Stage 2: detect
    thresh = update_detector_threshold(
        state.thresh, state.last_kl_num, p.ReferencePoints,
        p.DetectorAutoGain, p.DetectorMaxThresh, p.DetectorMinThresh)

    det = timeit("detect_keylines", detect_keylines, ss, thresh,
                 K=p.KeylineMax, kl_max=p.MaxPoints,
                 win_s=p.DetectorPlaneFitSize, per_hist=p.DetectorPosNegThresh,
                 dog_thresh=p.DetectorDoGThresh, max_img_value=MAX_IMG_VALUE,
                 cx=cam.cx, cy=cam.cy)
    klm, mask_img, kl_num = det

    retuned = timeit("re_estimate_thresh",
                     jax.jit(re_estimate_thresh, static_argnums=(1, 2)),
                     klm, p.TrackPoints, p.QCutOffNumBins)

    s_rho_q = timeit("estimate_quantile",
                     jax.jit(lambda m: estimate_quantile(
                         m, percentile=p.QCutOffQuantile,
                         nbins=p.QCutOffNumBins)), state.klm)

    # Stage 3: field
    field_img = timeit("build_field", build_field, klm, retuned,
                       radius=min(p.FieldRadius, p.SearchRange),
                       height=cam.height, width=cam.width)
    fv = FieldView.from_map(field_img, klm)

    # Stage 4: pose solver
    mres = timeit("minimizer_rv (2+2+5 LM iters)", minimizer_rv,
                  state.Vel, state.W0, state.klm, fv,
                  zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
                  width=cam.width, height=cam.height,
                  max_r=jnp.asarray(float(p.SearchRange), jnp.float32),
                  match_thresh=p.TrackerMatchThresh, max_s_rho=s_rho_q,
                  match_num_min=jnp.asarray(3, jnp.int32),
                  k_huber=p.ReweigthDistance,
                  iter_max=p.TrackerIterNum, init_iter=p.TrackerInitIterNum,
                  init_type=p.TrackerInitType)

    # Stage 5: forward match
    fm = timeit("forward_match", jax.jit(forward_match),
                state.klm, klm, mres.m_id_f)
    new_fm, _ = fm

    # Stage 6: directed matching (field-sampled)
    stride = p.MatchFieldStride
    steps = int(p.SearchRange / stride) + 3
    dres = timeit("directed_matching_field", directed_matching_field,
                  new_fm, state.klm, state.field_img,
                  mres.Vel, mres.RVel, jnp.eye(3),
                  zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
                  width=cam.width, height=cam.height,
                  max_steps=steps, stride=stride,
                  min_thr_mod=p.MatchThreshModule,
                  min_thr_ang=p.MatchThreshAngle,
                  max_radius=float(p.SearchRange),
                  loc_uncertainty=p.LocationUncertaintyMatch)

    # Stage 7: depth filtering chain
    reg = timeit("regularize_1_iter",
                 jax.jit(lambda m: regularize_1_iter(m, p.RegularizeThresh)),
                 dres.new)
    proc = reg[0]
    ek = timeit("depth_ekf",
                jax.jit(lambda m, V: depth_ekf(
                    m, V, cam.zfm, reshape_q_abs=p.ReshapeQAbsolute,
                    loc_uncertainty=p.LocationUncertainty)),
                proc, mres.Vel)
    timeit("estimate_rescaling_opt",
           jax.jit(lambda m: estimate_rescaling_opt(m, apply=True)), ek)

    # Full step for comparison
    timeit("FULL step", fe.step, state, frame, jnp.asarray(1.0), n=30)


if __name__ == "__main__":
    main()
