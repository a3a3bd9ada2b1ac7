"""Edge-landmark bundle adjustment with Schur-complement reduction.

The reference has no BA — its pose_graph is a measurement log
(SURVEY.md §2.3). This backend implements the distributed BA the
blueprint calls for (SURVEY.md §2.9 / §7.1 item 4):

  * landmarks are the VO's edge keylines: scalar inverse depths anchored
    in a host keyframe, observed in other keyframes along their edge
    normal (1-D residuals — the aperture-aware measurement the front
    end already uses);
  * scalar landmarks make the Schur elimination exact and cheap: the
    reduced camera system is H_pp - S^T diag(1/h_l) S where S is the
    per-landmark accumulation of pose-Jacobian x depth-Jacobian
    products — computed as ONE [6F, L] x [L, 6F] matmul (MXU);
  * the landmark/observation axes shard over the device mesh
    (`shard_map`), each device reducing its landmark block's
    contribution, with `psum` assembling the reduced system — Schur
    block rows over ICI exactly as the survey prescribes;
  * the dense reduced solve (6F x 6F, F = keyframes) is replicated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rebvo_tpu.core.geometry import so3_exp

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Fixed-size BA problem. L landmarks, O observations, F keyframes.

    Landmark l is anchored in keyframe `anchor[l]` at hom coords
    (lpx, lpy) with inverse depth rho[l]. Observation o sees landmark
    `obs_lm[o]` in keyframe `obs_kf[o]` at hom coords (mx, my), with
    edge normal (ux, uy) and weight w (1/sigma_pixels).
    """

    anchor: Array   # [L] int32
    lpx: Array      # [L]
    lpy: Array      # [L]
    rho: Array      # [L] inverse depth state
    lvalid: Array   # [L] bool
    obs_lm: Array   # [O] int32
    obs_kf: Array   # [O] int32
    mx: Array       # [O]
    my: Array       # [O]
    ux: Array       # [O]
    uy: Array       # [O]
    w: Array        # [O]
    ovalid: Array   # [O] bool


def _obs_residual(dx_a, dp_a, dx_f, dp_f, drho, Ra, pa, Rf, pf,
                  lpx, lpy, rho, mx, my, ux, uy, zfm):
    """1-D residual of one observation under local perturbations.

    Poses are camera-to-world: Xw = R Xc + p, perturbed on the left
    (R <- exp(dw) R, p <- p + dp); depth perturbed additively.
    """
    Ra2 = so3_exp(dx_a) @ Ra
    Rf2 = so3_exp(dx_f) @ Rf
    r = rho + drho
    z = 1.0 / r
    Xa = jnp.stack([lpx * z / zfm, lpy * z / zfm, z])
    Xw = Ra2 @ Xa + (pa + dp_a)
    Xf = Rf2.T @ (Xw - (pf + dp_f))
    # sign-preserving depth clamp: a point that wanders behind the
    # camera during an iteration must not poison the solve with inf/NaN
    # (the robust weight then suppresses the huge residual).
    z_safe = jnp.sign(Xf[2]) * jnp.maximum(jnp.abs(Xf[2]), 0.05)
    z_safe = jnp.where(z_safe == 0, 0.05, z_safe)
    hx = Xf[0] * zfm / z_safe
    hy = Xf[1] * zfm / z_safe
    return ux * (hx - mx) + uy * (hy - my)


def _build_terms(R, p, prob: BAProblem, zfm, huber_k: float):
    """Per-observation residual + Jacobians (13 local dofs) and robust
    weights."""
    dt = p.dtype
    z13 = jnp.zeros((13,), dt)

    def one(o):
        a = prob.anchor[prob.obs_lm[o]]
        f = prob.obs_kf[o]
        l = prob.obs_lm[o]

        def local(d):
            return _obs_residual(d[0:3], d[3:6], d[6:9], d[9:12], d[12],
                                 R[a], p[a], R[f], p[f],
                                 prob.lpx[l], prob.lpy[l], prob.rho[l],
                                 prob.mx[o], prob.my[o],
                                 prob.ux[o], prob.uy[o], zfm)

        r = local(z13)
        # Forward-mode ONLY: reverse-mode grad inside vmap silently
        # returns wrong values under shard_map in jax 0.9.0 (rows get
        # duplicated/mixed across the batch) — reproduced in
        # tests/test_backend.py::test_jax_shardmap_grad_bug_guard.
        J = jax.jacfwd(local)(z13)
        return r, J[0:6], J[6:12], J[12]

    O = prob.obs_lm.shape[0]
    r, Ja, Jf, Jr = jax.vmap(one)(jnp.arange(O))

    lm_ok = prob.lvalid[prob.obs_lm]
    use = prob.ovalid & lm_ok
    wgt = jnp.where(use, prob.w, 0.0)
    # robust (Huber) IRLS weight on the weighted residual
    rw = r * wgt
    hub = jnp.where(jnp.abs(rw) > huber_k,
                    jnp.sqrt(huber_k / jnp.clip(jnp.abs(rw), 1e-12, None)),
                    1.0)
    wgt = wgt * hub
    return r, Ja, Jf, Jr, wgt


def _eval_cost(R, p, prob: BAProblem, zfm, huber_k: float):
    """Residual-only robust cost (no Jacobians) for LM step control."""
    dt = p.dtype
    z13 = jnp.zeros((13,), dt)

    def one(o):
        a = prob.anchor[prob.obs_lm[o]]
        f = prob.obs_kf[o]
        l = prob.obs_lm[o]
        return _obs_residual(z13[0:3], z13[3:6], z13[6:9], z13[9:12],
                             z13[12], R[a], p[a], R[f], p[f],
                             prob.lpx[l], prob.lpy[l], prob.rho[l],
                             prob.mx[o], prob.my[o], prob.ux[o],
                             prob.uy[o], zfm)

    r = jax.vmap(one)(jnp.arange(prob.obs_lm.shape[0]))
    use = prob.ovalid & prob.lvalid[prob.obs_lm]
    wgt = jnp.where(use, prob.w, 0.0)
    rw = r * wgt
    hub = jnp.where(jnp.abs(rw) > huber_k,
                    jnp.sqrt(huber_k / jnp.clip(jnp.abs(rw), 1e-12, None)),
                    1.0)
    rw = rw * hub
    return jnp.sum(rw * rw)


def _reduce_terms(r, Ja, Jf, Jr, wgt, prob: BAProblem, F: int):
    """Assemble H_pp, b_p and the landmark-block quantities."""
    dt = r.dtype
    L = prob.rho.shape[0]
    a_idx = prob.anchor[prob.obs_lm]
    f_idx = prob.obs_kf
    l_idx = prob.obs_lm

    Jas = Ja * wgt[:, None]
    Jfs = Jf * wgt[:, None]
    Jrs = Jr * wgt
    rs = r * wgt

    # Dense pose Hessian via scatter-add of the four block products.
    H = jnp.zeros((F, 6, F, 6), dt)
    H = H.at[a_idx, :, a_idx, :].add(jnp.einsum("oi,oj->oij", Jas, Jas,
                                                precision=_HI))
    H = H.at[f_idx, :, f_idx, :].add(jnp.einsum("oi,oj->oij", Jfs, Jfs,
                                                precision=_HI))
    cross = jnp.einsum("oi,oj->oij", Jas, Jfs, precision=_HI)
    H = H.at[a_idx, :, f_idx, :].add(cross)
    H = H.at[f_idx, :, a_idx, :].add(jnp.swapaxes(cross, 1, 2))
    b = jnp.zeros((F, 6), dt)
    b = b.at[a_idx].add(Jas * rs[:, None])
    b = b.at[f_idx].add(Jfs * rs[:, None])

    # Landmark terms: h_l, g_l and the landmark-pose coupling S [L, 6F].
    h_l = jnp.zeros((L,), dt).at[l_idx].add(Jrs * Jrs)
    g_l = jnp.zeros((L,), dt).at[l_idx].add(Jrs * rs)
    S = jnp.zeros((L, F, 6), dt)
    S = S.at[l_idx, a_idx, :].add(Jas * Jrs[:, None])
    S = S.at[l_idx, f_idx, :].add(Jfs * Jrs[:, None])

    cost = jnp.sum(rs * rs)
    return H.reshape(F * 6, F * 6), b.reshape(F * 6), h_l, g_l, \
        S.reshape(L, F * 6), cost


def _gauge_fix(H_red, b_red, F: int, damping):
    """Pin the first pose by excising its rows/columns (an identity
    block) — a huge diagonal prior would wreck the f32 conditioning."""
    dt = b_red.dtype
    H_red = H_red + jnp.eye(F * 6, dtype=dt) * damping
    H_red = H_red.at[:6, :].set(0.0).at[:, :6].set(0.0)
    H_red = H_red.at[:6, :6].set(jnp.eye(6, dtype=dt))
    b_red = b_red.at[:6].set(0.0)
    return H_red, b_red


def _schur_solve(H, b, h_l, g_l, S, F: int, damping: float):
    dt = b.dtype
    inv_h = jnp.where(h_l > 1e-12, 1.0 / (h_l + damping), 0.0)
    H_red = H - jnp.einsum("lk,lm->km", S * inv_h[:, None], S,
                           precision=_HI)
    b_red = b - S.T @ (inv_h * g_l)
    H_red, b_red = _gauge_fix(H_red, b_red, F, damping)
    dx = jnp.linalg.solve(H_red, -b_red)
    drho = -inv_h * (g_l + S @ dx)
    return dx, drho


def _apply_update(R, p, rho, dx, drho, max_drho=0.5):
    F = R.shape[0]
    dxp = dx.reshape(F, 6)
    R2 = jax.vmap(lambda w_, Rn: so3_exp(w_) @ Rn)(dxp[:, :3], R)
    p2 = p + dxp[:, 3:]
    rho2 = jnp.clip(rho + jnp.clip(drho, -max_drho, max_drho), 1e-4, 30.0)
    return R2, p2, rho2


@partial(jax.jit, static_argnames=("iters", "huber_k"))
def ba_solve(R: Array, p: Array, prob: BAProblem, zfm: Array,
             iters: int = 8, huber_k: float = 3.0,
             damping: float = 1e-3) -> Tuple[Array, Array, Array, Array]:
    """Single-device Gauss-Newton BA. Returns (R', p', rho', costs)."""
    F = R.shape[0]

    def it(carry, _):
        R, p, rho, lam = carry
        pb = prob._replace(rho=rho)
        r, Ja, Jf, Jr, wgt = _build_terms(R, p, pb, zfm, huber_k)
        H, b, h_l, g_l, S, cost = _reduce_terms(r, Ja, Jf, Jr, wgt, pb, F)
        dx, drho = _schur_solve(H, b, h_l, g_l, S, F, lam)
        R2, p2, rho2 = _apply_update(R, p, rho, dx, drho)
        cost_new = _eval_cost(R2, p2, pb._replace(rho=rho2), zfm, huber_k)
        acc = (cost_new < cost) & jnp.isfinite(cost_new)
        sel = lambda a_, b_: jnp.where(acc, a_, b_)
        R3 = sel(R2, R)
        p3 = sel(p2, p)
        rho3 = sel(rho2, rho)
        lam2 = jnp.where(acc, lam * 0.5, lam * 8.0)
        lam2 = jnp.clip(lam2, 1e-6, 1e6)
        return (R3, p3, rho3, lam2), cost

    lam0 = jnp.asarray(damping, p.dtype)
    (R2, p2, rho2, _), costs = jax.lax.scan(
        it, (R, p, prob.rho, lam0), None, length=iters)
    return R2, p2, rho2, costs


def ba_solve_sharded(R: Array, p: Array, prob: BAProblem, zfm: Array,
                     mesh: Mesh, iters: int = 8, huber_k: float = 3.0,
                     damping: float = 1e-3):
    """Distributed BA: landmarks and their observations are sharded over
    the mesh's `data` axis; each device reduces its landmark block's
    contribution to the reduced camera system, which is `psum`'d over
    ICI and solved replicated (SURVEY.md §2.9 TP row).

    Requires: observations pre-partitioned so each landmark's
    observations live on the shard holding the landmark, with `obs_lm`
    indices LOCAL to the shard (use `partition_problem`). L and O must
    divide the mesh size.
    """
    F = R.shape[0]
    axis = mesh.axis_names[0]

    lspec = P(axis)
    ospec = P(axis)
    pspec = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspec, pspec,
                       BAProblem(anchor=lspec, lpx=lspec, lpy=lspec,
                                 rho=lspec, lvalid=lspec, obs_lm=ospec,
                                 obs_kf=ospec, mx=ospec, my=ospec,
                                 ux=ospec, uy=ospec, w=ospec,
                                 ovalid=ospec),
                       pspec),
             out_specs=(pspec, pspec, lspec, pspec))
    def run(R, p, pb, zfm):
        def it(carry, _):
            R, p, rho, lam = carry
            pbl = pb._replace(rho=rho)
            r, Ja, Jf, Jr, wgt = _build_terms(R, p, pbl, zfm, huber_k)
            H, b, h_l, g_l, S, cost = _reduce_terms(r, Ja, Jf, Jr, wgt,
                                                    pbl, F)
            dt = p.dtype
            inv_h = jnp.where(h_l > 1e-12, 1.0 / (h_l + lam), 0.0)
            # local landmark-block Schur contributions, then psum.
            H_corr = jnp.einsum("lk,lm->km", S * inv_h[:, None], S,
                                precision=_HI)
            b_corr = S.T @ (inv_h * g_l)
            H_red = jax.lax.psum(H - H_corr, axis)
            b_red = jax.lax.psum(b - b_corr, axis)
            cost = jax.lax.psum(cost, axis)
            H_red, b_red = _gauge_fix(H_red, b_red, F, lam)
            dx = jnp.linalg.solve(H_red, -b_red)
            drho = -inv_h * (g_l + S @ dx)
            R2, p2, rho2 = _apply_update(R, p, rho, dx, drho)
            cost_new = jax.lax.psum(
                _eval_cost(R2, p2, pbl._replace(rho=rho2), zfm, huber_k),
                axis)
            acc = (cost_new < cost) & jnp.isfinite(cost_new)
            sel = lambda a_, b_: jnp.where(acc, a_, b_)
            lam2 = jnp.clip(jnp.where(acc, lam * 0.5, lam * 8.0),
                            1e-6, 1e6)
            return (sel(R2, R), sel(p2, p), sel(rho2, rho), lam2), cost

        lam0 = jnp.asarray(damping, p.dtype)
        (R2, p2, rho2, _), costs = jax.lax.scan(
            it, (R, p, pb.rho, lam0), None, length=iters)
        return R2, p2, rho2, costs

    return run(R, p, prob, zfm)


def partition_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Host-side re-layout: landmarks into contiguous equal blocks and
    each observation onto its landmark's shard, with obs_lm rewritten to
    shard-local indices. Pads both axes to multiples of n_shards.

    Fully vectorised (round-1's per-observation Python loop is gone):
    a stable sort by shard plus a cumulative per-shard rank computes
    every observation's destination slot in O(O log O) numpy."""
    import numpy as np

    L = prob.rho.shape[0]
    Lp = ((L + n_shards - 1) // n_shards) * n_shards
    per_l = Lp // n_shards

    def pad_l(a, fill=0):
        a = np.asarray(a)
        return np.concatenate([a, np.full((Lp - L,) + a.shape[1:], fill,
                                          a.dtype)])

    obs_lm = np.asarray(prob.obs_lm)
    ovalid = np.asarray(prob.ovalid)
    shard_of = obs_lm // per_l

    valid_idx = np.nonzero(ovalid)[0]
    vshard = shard_of[valid_idx]
    order = np.argsort(vshard, kind="stable")       # valid obs by shard
    src = valid_idx[order]                          # source indices
    sshard = vshard[order]
    counts = np.bincount(sshard, minlength=n_shards)
    per_o = int(counts.max()) if counts.size and counts.max() > 0 else 1
    Op = per_o * n_shards
    # rank of each sorted obs within its shard = position - shard start
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(src.shape[0]) - starts[sshard]
    dst = sshard * per_o + rank                     # destination slots

    def new_obs(a, fill=0):
        a = np.asarray(a)
        out = np.full((Op,) + a.shape[1:], fill, a.dtype)
        out[dst] = a[src]
        return out

    ovalid_new = np.zeros(Op, bool)
    ovalid_new[dst] = True
    obs_lm_local = new_obs(obs_lm, 0) % per_l

    return BAProblem(
        anchor=jnp.asarray(pad_l(prob.anchor)),
        lpx=jnp.asarray(pad_l(prob.lpx)),
        lpy=jnp.asarray(pad_l(prob.lpy)),
        rho=jnp.asarray(pad_l(prob.rho, 1.0)),
        lvalid=jnp.asarray(pad_l(prob.lvalid, False)),
        obs_lm=jnp.asarray(obs_lm_local),
        obs_kf=jnp.asarray(new_obs(prob.obs_kf)),
        mx=jnp.asarray(new_obs(prob.mx)),
        my=jnp.asarray(new_obs(prob.my)),
        ux=jnp.asarray(new_obs(prob.ux)),
        uy=jnp.asarray(new_obs(prob.uy)),
        w=jnp.asarray(new_obs(prob.w)),
        ovalid=jnp.asarray(ovalid_new),
    )


def problem_from_keyframes(store, zfm: float, *, width: int, height: int,
                           cx: float, cy: float,
                           match_thresh: float = 0.75,
                           max_s_rho: float = 20.0,
                           field_radius: int = 4,
                           window: int = 2,
                           rho_sigma: float = 3.0,
                           mutual_px: float = 0.0,
                           revisit_dist: float = 0.0,
                           revisit_min_gap: int = 8,
                           landmark_stride: int = 1) -> BAProblem:
    """Build a BA problem from a KeyframeStore by re-matching each
    keyframe's keylines into the `window` FOLLOWING keyframes (the
    correspondence source the reference's kfvo builds online via
    buildForwardMatch/correctAugmentate, kfvo.cpp:739-1041; here rebuilt
    offline from the stored maps, which is all `run_ba` needs).

    Landmarks: every valid keyline of keyframes 0..F-2, anchored in its
    own keyframe at its stored hom position/depth (global id f*K + k).
    Observations: the landmark projected into keyframes f+1..f+window
    via the stored poses, matched to the nearest keyline of the target
    map through a match field, gradient-gated exactly like the tracker
    (Test_f_k). `window` must be >= 2 so a landmark's single depth ties
    the translation scales of consecutive pairs — with window=1 the
    monocular problem factors into independent two-view problems, each
    with a free scale gauge.

    `revisit_dist > 0` additionally associates NON-consecutive keyframe
    pairs whose stored positions are within that distance (and at least
    `revisit_min_gap` indices apart) — loop-closure-style constraints
    that tie a long trajectory's revisit cycles together, which is
    where offline BA pays against dead-reckoned drift (consecutive-pair
    constraints only smooth what the online filter already averaged).
    `landmark_stride` thins the landmark set (every Nth keyline) to
    bound problem size on long runs.
    """
    from rebvo_tpu.backend.kfvo import relative_pose, transform_map
    from rebvo_tpu.kernels.field import build_field

    F = store.capacity
    K = store.klm.x.shape[1]
    dt = store.Pos.dtype

    fields = [build_field(jax.tree_util.tree_map(lambda a: a[g], store.klm),
                          jnp.zeros((), dt), radius=field_radius,
                          height=height, width=width).reshape(-1)
              for g in range(F)]

    def pair(f, g):
        src = jax.tree_util.tree_map(lambda a: a[f], store.klm)
        dst = jax.tree_util.tree_map(lambda a: a[g], store.klm)
        ok_pair = store.valid[f] & store.valid[g]

        R, t = relative_pose(store.Pose[f], store.Pos[f],
                             store.Pose[g], store.Pos[g])
        moved = transform_map(src, R, t, zfm)

        xr = jnp.floor(moved.px + cx + 0.5).astype(jnp.int32)
        yr = jnp.floor(moved.py + cy + 0.5).astype(jnp.int32)
        inb = (xr >= 1) & (yr >= 1) & (xr < width - 1) & (yr < height - 1)
        lin = jnp.clip(yr, 0, height - 1) * width + jnp.clip(xr, 0, width - 1)
        j = jnp.where(inb, fields[g][lin], -1)
        js = jnp.maximum(j, 0)

        # Gradient-similarity gate (Test_f_k semantics).
        p_n2 = moved.n_m * moved.n_m
        p_esc = moved.gx * dst.gx[js] + moved.gy * dst.gy[js]
        grad_ok = jnp.abs(p_esc - p_n2) <= match_thresh * p_n2

        # Inverse-depth consistency gate (Calc_f_J_Complete semantics,
        # global_tracker.cpp:115-169): the matched keyline's own depth
        # estimate must agree with the transported one — prunes
        # wrong-edge field hits that the gradient gate lets through.
        sig = jnp.sqrt(moved.s_rho ** 2 + dst.s_rho[js] ** 2)
        rho_ok = jnp.abs(moved.rho - dst.rho[js]) <= rho_sigma * sig

        # Round-trip symmetry gate (the offline analogue of kfvo's
        # mutualExclusionSimple, reference src/mtracklib/kfvo.cpp:423-525
        # — VERDICT r4 #3a): transport the MATCHED keyline back into the
        # source keyframe with ITS OWN stored depth and require it to
        # land on the source keyline. An occlusion-silhouette match (the
        # projected landmark grabbing the foreground edge that occludes
        # it) carries the occluder's depth, so its back-projection lands
        # off the source by the parallax of the depth gap — exactly the
        # biased-correspondence class that made aggressive re-matching
        # DEGRADE the round-4 KF ATE 3x.
        Rb = R.T
        tb = -(R.T @ t)
        rho_d = jnp.maximum(dst.rho[js], 1e-6)
        Pz = 1.0 / rho_d
        Px = dst.px[js] * Pz / zfm
        Py = dst.py[js] * Pz / zfm
        bx3 = Rb[0, 0] * Px + Rb[0, 1] * Py + Rb[0, 2] * Pz + tb[0]
        by3 = Rb[1, 0] * Px + Rb[1, 1] * Py + Rb[1, 2] * Pz + tb[1]
        bz3 = Rb[2, 0] * Px + Rb[2, 1] * Py + Rb[2, 2] * Pz + tb[2]
        bz3 = jnp.where(jnp.abs(bz3) > 1e-9, bz3, 1e-9)
        bx = bx3 * zfm / bz3
        by = by3 * zfm / bz3
        # tolerance grows with the parallax the matched keyline's OWN
        # depth uncertainty induces (first order: zf * |t| * s_rho): a
        # legitimately noisy depth back-projects off by that much, while
        # an occlusion match is off by the full foreground/background
        # depth gap — typically many sigma
        if mutual_px > 0:
            tol = mutual_px + zfm * jnp.linalg.norm(t) * dst.s_rho[js]
            mutual_ok = (jnp.square(bx - src.px) +
                         jnp.square(by - src.py) <= tol * tol)
        else:
            # opt-in (run_ba --mutual-px): measured on the parity
            # stores, the round-trip cull prunes more good than bad
            # correspondences once the rho-consistency gate has run;
            # the measured BA win came from revisit PAIRING instead
            mutual_ok = jnp.ones_like(rho_ok)

        good = (src.valid & dst.valid[js] & (j >= 0) & grad_ok & rho_ok &
                mutual_ok & ok_pair & (src.s_rho <= max_s_rho) & lm_keep)

        w = jnp.where(good, 1.0 / jnp.maximum(dst.s_rho[js], 0.05), 0.0)
        return dict(
            obs_lm=jnp.arange(K, dtype=jnp.int32) + f * K,
            obs_kf=jnp.full((K,), g, jnp.int32),
            mx=dst.x[js] - cx, my=dst.y[js] - cy,
            ux=dst.ux[js], uy=dst.uy[js],
            w=w, ovalid=good)

    lm_keep = jnp.arange(K) % max(landmark_stride, 1) == 0

    def landmarks(f):
        src = jax.tree_util.tree_map(lambda a: a[f], store.klm)
        return dict(anchor=jnp.full((K,), f, jnp.int32),
                    lpx=src.px, lpy=src.py, rho=src.rho,
                    lvalid=src.valid & store.valid[f] & lm_keep)

    lms = [landmarks(f) for f in range(F - 1)]
    pairs = [(f, g) for f in range(F - 1)
             for g in range(f + 1, min(f + window, F - 1) + 1)]
    if revisit_dist > 0:
        import numpy as _np
        P = _np.asarray(store.Pos)
        live = _np.asarray(store.valid)
        have = set(pairs)
        for f in range(F - 1):
            if not live[f]:
                continue
            d = _np.linalg.norm(P - P[f], axis=1)
            for g in range(f + revisit_min_gap, F - 1):
                if live[g] and d[g] < revisit_dist and (f, g) not in have:
                    pairs.append((f, g))
                    have.add((f, g))
    obs = [pair(f, g) for f, g in pairs]
    catl = lambda name: jnp.concatenate([p[name] for p in lms])
    cato = lambda name: jnp.concatenate([p[name] for p in obs])
    return BAProblem(
        anchor=catl("anchor"), lpx=catl("lpx"), lpy=catl("lpy"),
        rho=catl("rho"), lvalid=catl("lvalid"), obs_lm=cato("obs_lm"),
        obs_kf=cato("obs_kf"), mx=cato("mx"), my=cato("my"),
        ux=cato("ux"), uy=cato("uy"), w=cato("w"), ovalid=cato("ovalid"))


def synth_ring_problem(F: int, L: int, obs_per: int, zfm: float,
                       seed: int = 0, rho_noise: float = 0.1):
    """Deterministic synthetic BA benchmark problem: F cameras on a ring,
    L landmarks anchored uniformly, each observed from `obs_per`
    subsequent keyframes with exact reprojections and log-normal noise on
    the inverse depths. Shared by tests/test_ba_scale.py and the
    multi-host scaling harness so both exercise the identical problem.

    Returns (R_true [F,3,3], p_true [F,3], rho_true [L], BAProblem)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    ang = np.linspace(0, 2 * np.pi, F, endpoint=False)
    p_true = np.stack([np.cos(ang), np.sin(ang), np.zeros(F)],
                      1).astype(np.float32) * 0.5
    R_true = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
    anchor = rng.randint(0, F, L).astype(np.int32)
    lpx = rng.uniform(-60, 60, L).astype(np.float32)
    lpy = rng.uniform(-40, 40, L).astype(np.float32)
    rho_true = rng.uniform(0.2, 1.0, L).astype(np.float32)

    l_idx = np.repeat(np.arange(L), obs_per)
    off = np.tile(np.arange(1, obs_per + 1), L)
    f_idx = (anchor[l_idx] + off) % F
    z = 1.0 / rho_true[l_idx]
    Xa = np.stack([lpx[l_idx] * z / zfm, lpy[l_idx] * z / zfm, z], 1)
    Xw = np.einsum("fij,fj->fi", R_true[anchor[l_idx]], Xa) + \
        p_true[anchor[l_idx]]
    Xf = np.einsum("fji,fj->fi", R_true[f_idx], Xw - p_true[f_idx])
    mx = (Xf[:, 0] * zfm / Xf[:, 2]).astype(np.float32)
    my = (Xf[:, 1] * zfm / Xf[:, 2]).astype(np.float32)
    th = rng.uniform(0, np.pi, l_idx.shape[0])
    O = l_idx.shape[0]
    prob = BAProblem(
        anchor=jnp.asarray(anchor), lpx=jnp.asarray(lpx),
        lpy=jnp.asarray(lpy),
        rho=jnp.asarray(
            rho_true * np.exp(rng.randn(L).astype(np.float32) * rho_noise)),
        lvalid=jnp.ones((L,), bool),
        obs_lm=jnp.asarray(l_idx.astype(np.int32)),
        obs_kf=jnp.asarray(f_idx.astype(np.int32)),
        mx=jnp.asarray(mx), my=jnp.asarray(my),
        ux=jnp.asarray(np.cos(th).astype(np.float32)),
        uy=jnp.asarray(np.sin(th).astype(np.float32)),
        w=jnp.ones((O,), jnp.float32), ovalid=jnp.ones((O,), bool))
    return R_true, p_true, rho_true, prob
