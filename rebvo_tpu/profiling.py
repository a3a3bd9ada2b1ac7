"""Per-stage device-time breakdown and roofline accounting for the VO
step (SURVEY.md §7.2 item 5: the kernel speed-of-light study).

`stage_breakdown` times each sub-kernel with realistic mid-sequence
inputs (state taken after full steps, so gather/scatter densities match
production). `roofline` turns measured times into utilisation numbers
against an explicit, documented byte/flop model — NOT XLA's
cost_analysis 'bytes accessed', which counts pre-fusion logical
accesses and overstates HBM traffic by orders of magnitude (measured
23.5 GB/step for a step that executes in ~0.3 ms; HBM peak would allow
0.25 GB in that time).

Peak numbers are per-chip for the benchmark device (TPU v5e / 'v5
lite'): 197 TFLOP/s bf16 MXU, ~819 GB/s HBM.
"""

from __future__ import annotations

import time
from typing import Dict

HBM_PEAK_BYTES_S = 819e9        # TPU v5e HBM bandwidth
MXU_PEAK_FLOPS_S = 197e12       # TPU v5e bf16 peak


def _timeit(fn, *args, n=20, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def stage_breakdown(fe, state, frame, n: int = 20) -> Dict[str, float]:
    """Per-stage times (ms) of one VO step's sub-kernels, plus the full
    fused step for comparison. `state` should be a mid-sequence state."""
    import jax
    import jax.numpy as jnp

    from rebvo_tpu.frontend.step import MAX_IMG_VALUE
    from rebvo_tpu.kernels.depth_filter import (depth_ekf, estimate_quantile,
                                                estimate_rescaling_opt,
                                                regularize_1_iter)
    from rebvo_tpu.kernels.edge_detect import (detect_keylines,
                                               re_estimate_thresh,
                                               update_detector_threshold)
    from rebvo_tpu.kernels.field import build_field
    from rebvo_tpu.kernels.matching import (directed_matching_field,
                                            forward_match)
    from rebvo_tpu.kernels.pose_solver import FieldView, minimizer_rv
    from rebvo_tpu.kernels.scale_space import build_scale_space

    p = fe.params
    cam = fe.cam
    out: Dict[str, float] = {}

    if fe.use_pallas:
        from rebvo_tpu.kernels.pallas_scale_space import \
            build_scale_space_pallas
        dt, ss = _timeit(build_scale_space_pallas, frame, p.Sigma0,
                         p.KSigma, 3, n=n)
        out["scale_space_pallas"] = dt * 1e3
        dt, _ = _timeit(build_scale_space, frame, p.Sigma0, p.KSigma, 3,
                        n=n)
        out["scale_space_xla"] = dt * 1e3
    else:
        dt, ss = _timeit(build_scale_space, frame, p.Sigma0, p.KSigma, 3,
                         n=n)
        out["scale_space_xla"] = dt * 1e3

    thresh = update_detector_threshold(
        state.thresh, state.last_kl_num, p.ReferencePoints,
        p.DetectorAutoGain, p.DetectorMaxThresh, p.DetectorMinThresh)
    dt, det = _timeit(
        detect_keylines, ss, thresh, K=p.KeylineMax, kl_max=p.MaxPoints,
        win_s=p.DetectorPlaneFitSize, per_hist=p.DetectorPosNegThresh,
        dog_thresh=p.DetectorDoGThresh, max_img_value=MAX_IMG_VALUE,
        cx=cam.cx, cy=cam.cy, n=n)
    out["detect"] = dt * 1e3
    klm, mask_img, kl_num = det

    retuned = re_estimate_thresh(klm, p.TrackPoints, p.QCutOffNumBins)
    s_rho_q = estimate_quantile(state.klm, percentile=p.QCutOffQuantile,
                                nbins=p.QCutOffNumBins)

    dt, field_img = _timeit(build_field, klm, retuned,
                            radius=min(p.FieldRadius, p.SearchRange),
                            height=cam.height, width=cam.width, n=n)
    out["field"] = dt * 1e3
    fv = FieldView.from_map(field_img, klm)

    dt, mres = _timeit(
        minimizer_rv, state.Vel, state.W0, state.klm, fv,
        zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height,
        max_r=jnp.asarray(float(p.SearchRange), jnp.float32),
        match_thresh=p.TrackerMatchThresh, max_s_rho=s_rho_q,
        match_num_min=jnp.asarray(3, jnp.int32),
        k_huber=p.ReweigthDistance, iter_max=p.TrackerIterNum,
        init_iter=p.TrackerInitIterNum, init_type=p.TrackerInitType, n=n)
    out["pose_solver"] = dt * 1e3

    new_fm, _ = forward_match(state.klm, klm, mres.m_id_f)
    stride = p.MatchFieldStride
    steps = int(p.SearchRange / stride) + 3
    dt, dres = _timeit(
        directed_matching_field, new_fm, state.klm, state.field_img,
        mres.Vel, mres.RVel, jnp.eye(3),
        zfm=cam.zfm, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height, max_steps=steps, stride=stride,
        min_thr_mod=p.MatchThreshModule, min_thr_ang=p.MatchThreshAngle,
        max_radius=float(p.SearchRange),
        loc_uncertainty=p.LocationUncertaintyMatch, n=n)
    out["matching"] = dt * 1e3

    ekf_chain = jax.jit(lambda m, V: estimate_rescaling_opt(
        depth_ekf(regularize_1_iter(m, p.RegularizeThresh)[0], V, cam.zfm,
                  reshape_q_abs=p.ReshapeQAbsolute,
                  loc_uncertainty=p.LocationUncertainty), apply=True))
    dt, _ = _timeit(ekf_chain, dres.new, mres.Vel, n=n)
    out["depth_filter"] = dt * 1e3

    dt, _ = _timeit(fe.step, state, frame, jnp.asarray(1.0), n=n)
    out["full_step"] = dt * 1e3
    return out


def matching_gather_floor(fe, state, n: int = 20) -> float:
    """Latency floor (ms) for the directed matcher's gather pattern: the
    same volume/locality of data-dependent gathers as the real stage —
    [K, 2*steps] field-image probes along stride-spaced line segments
    from random bases, one [hit_cap, 8] attribute-row gather per keyline
    — with ALL matching logic stripped. If the real stage's time is
    close to this, it sits at the hardware's gather-latency floor and
    its low HBM utilisation is the cost of random access, not of the
    kernel (round-4 review #5 done-when criterion)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    p = fe.params
    H, W = p.ImageHeight, p.ImageWidth
    K = p.KeylineMax
    stride = max(p.MatchFieldStride, 1)
    steps = int(p.SearchRange / stride) + 3
    lanes = 2 * steps
    hit_cap = 8

    rng = np.random.RandomState(7)
    bx = rng.randint(0, W, size=(K, 1))
    by = rng.randint(0, H, size=(K, 1))
    ang = rng.uniform(0, 2 * np.pi, size=(K, 1))
    off = (np.arange(lanes)[None, :] - steps) * stride
    ix = np.clip(bx + (np.cos(ang) * off).astype(np.int64), 0, W - 1)
    iy = np.clip(by + (np.sin(ang) * off).astype(np.int64), 0, H - 1)
    lin = jnp.asarray(iy * W + ix, jnp.int32)
    jrows = jnp.asarray(rng.randint(0, K, size=(K, hit_cap)), jnp.int32)

    field_flat = state.field_img.reshape(-1)
    attrs = jnp.stack([state.klm.gx, state.klm.gy, state.klm.n_m,
                       state.klm.rho, state.klm.s_rho, state.klm.x,
                       state.klm.y, state.klm.gx * 0], axis=-1)

    def kernel(fimg, at, idx, jr):
        probes = fimg[idx]                       # [K, lanes] gathers
        rows = at[jr]                            # [K, hit_cap, 8] rows
        return jnp.sum(probes) + jnp.sum(rows)

    dt, _ = _timeit(jax.jit(kernel), field_flat, attrs, lin, jrows, n=n)
    return dt * 1e3


def roofline(fe, stage_ms: Dict[str, float]) -> Dict[str, float]:
    """Speed-of-light utilisation for the two dominant kernels, from
    explicit byte models (SURVEY.md §7.2):

    * scale space (the detector stencil's input): the fused kernel's
      minimum HBM traffic is one frame read + five frame writes
      (everything else lives in VMEM), 6*H*W*4 bytes.
    * pose solver (the field-gather TryVelRot): per LM evaluation it
      reads the keyline SoA (~14 f32 arrays of K) and gathers the field
      view (id + 6 attribute gathers of 4 B each per keyline); with
      I = 2*init_iter + iter_num + 2 evaluations, bytes ≈
      I * K * (14 + 7) * 4. A gather's random-access efficiency on HBM
      is well under 1.0, so this is a strict lower bound on traffic —
      i.e. utilisation is understated, never overstated.
    """
    p = fe.params
    H, W = p.ImageHeight, p.ImageWidth
    K = p.KeylineMax
    out: Dict[str, float] = {}

    ss_key = ("scale_space_pallas" if "scale_space_pallas" in stage_ms
              else "scale_space_xla")
    ss_bytes = 6 * H * W * 4
    ss_s = stage_ms[ss_key] * 1e-3
    out["scale_space_gbps"] = ss_bytes / ss_s / 1e9
    out["scale_space_hbm_util"] = ss_bytes / ss_s / HBM_PEAK_BYTES_S

    # scale-ladder warm start adds 4 more 2-iteration phases
    iters = 2 * p.TrackerInitIterNum + 3 * 3 + p.TrackerIterNum + 2
    ps_bytes = iters * K * (14 + 7) * 4
    ps_s = stage_ms["pose_solver"] * 1e-3
    out["pose_solver_gbps"] = ps_bytes / ps_s / 1e9
    out["pose_solver_hbm_util"] = ps_bytes / ps_s / HBM_PEAK_BYTES_S

    # directed matching (field variant): reads the query map SoA
    # (~16 f32 arrays of K incl. the match-transfer fields), samples the
    # field image at 2*steps ladder slots per keyline (4 B each), then
    # one [hit_cap=8, 8]-row attribute gather per keyline; writes the
    # ~12 updated SoA arrays. bytes ≈ K*(16*4 + 2*steps*4 + 8*8*4 +
    # 12*4). Gather efficiency < 1 makes this a strict lower bound.
    if "matching" in stage_ms:
        steps = int(p.SearchRange / max(p.MatchFieldStride, 1)) + 3
        m_bytes = K * (16 * 4 + 2 * steps * 4 + 8 * 8 * 4 + 12 * 4)
        m_s = stage_ms["matching"] * 1e-3
        out["matching_gbps"] = m_bytes / m_s / 1e9
        out["matching_hbm_util"] = m_bytes / m_s / HBM_PEAK_BYTES_S

    # depth filter chain (regularize + EKF + rescale): 3 passes over the
    # keyline SoA (~16 arrays) with the regularizer's 2 chain-neighbour
    # gathers of 8 attrs; bytes ≈ K*4*(3*16 + 2*8) read+write.
    if "depth_filter" in stage_ms:
        d_bytes = K * 4 * (3 * 16 + 2 * 8) * 2
        d_s = stage_ms["depth_filter"] * 1e-3
        out["depth_filter_gbps"] = d_bytes / d_s / 1e9
        out["depth_filter_hbm_util"] = d_bytes / d_s / HBM_PEAK_BYTES_S
    return out


def step_cost_analysis(fe, state, frame):
    """XLA's own per-step cost analysis (flops are trustworthy; 'bytes
    accessed' counts pre-fusion logical accesses — see module doc).
    Uses fe.step (the already-jitted entry) so the executable comes from
    the in-process compilation cache instead of a fresh compile."""
    import jax.numpy as jnp
    lowered = fe.step.lower(state, frame, jnp.asarray(0.05))
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return dict(flops=float(ca.get("flops", 0.0)),
                transcendentals=float(ca.get("transcendentals", 0.0)))
