"""BA scale-up tests (round-1 review item #8): the vectorised
observation partitioner and a long-trajectory-sized sharded solve
(64 keyframes x 1e5 landmarks x 3e5 observations over the full device
mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from rebvo_tpu.backend import ba as bam
from rebvo_tpu.parallel.mesh import data_mesh

ZFM = 200.0


def _ring_problem(F, L, obs_per, seed=0, rho_noise=0.1):
    # shared generator (also used by apps/run_multihost's big-BA check)
    return bam.synth_ring_problem(F, L, obs_per, ZFM, seed=seed,
                                  rho_noise=rho_noise)


def test_partition_problem_vectorised_layout():
    """Every valid observation lands on its landmark's shard with a
    shard-local landmark id; no observation is lost or duplicated."""
    rng = np.random.RandomState(3)
    L, O, S = 37, 211, 8                    # deliberately non-divisible
    prob = bam.BAProblem(
        anchor=jnp.asarray(rng.randint(0, 4, L).astype(np.int32)),
        lpx=jnp.asarray(rng.randn(L).astype(np.float32)),
        lpy=jnp.asarray(rng.randn(L).astype(np.float32)),
        rho=jnp.asarray(rng.uniform(0.2, 1.0, L).astype(np.float32)),
        lvalid=jnp.ones((L,), bool),
        obs_lm=jnp.asarray(rng.randint(0, L, O).astype(np.int32)),
        obs_kf=jnp.asarray(rng.randint(0, 4, O).astype(np.int32)),
        mx=jnp.asarray(np.arange(O, dtype=np.float32)),   # identity tag
        my=jnp.asarray(rng.randn(O).astype(np.float32)),
        ux=jnp.asarray(np.ones(O, np.float32)),
        uy=jnp.asarray(np.zeros(O, np.float32)),
        w=jnp.ones((O,), jnp.float32),
        ovalid=jnp.asarray(rng.rand(O) > 0.2))
    part = bam.partition_problem(prob, S)

    Lp = part.rho.shape[0]
    assert Lp % S == 0 and part.obs_lm.shape[0] % S == 0
    per_l = Lp // S
    per_o = part.obs_lm.shape[0] // S

    ovalid = np.asarray(prob.ovalid)
    src_lm = np.asarray(prob.obs_lm)
    # reconstruct global landmark ids on the partitioned layout
    shard = np.arange(part.obs_lm.shape[0]) // per_o
    glob_lm = np.asarray(part.obs_lm) + shard * per_l
    pvalid = np.asarray(part.ovalid)

    # every valid source obs appears exactly once (match via the mx tag)
    src_tags = np.sort(np.asarray(prob.mx)[ovalid])
    dst_tags = np.sort(np.asarray(part.mx)[pvalid])
    np.testing.assert_array_equal(src_tags, dst_tags)
    # and its landmark is on the right shard
    tag_to_lm = {float(np.asarray(prob.mx)[i]): src_lm[i]
                 for i in range(O) if ovalid[i]}
    for i in np.nonzero(pvalid)[0]:
        assert glob_lm[i] == tag_to_lm[float(np.asarray(part.mx)[i])]
        assert glob_lm[i] // per_l == shard[i]


def test_partition_matches_solve():
    """Partitioned + sharded solve equals the unpartitioned single-device
    solve (cost trajectory)."""
    R_true, p_true, rho_true, prob = _ring_problem(6, 48, 3)
    rng = np.random.RandomState(1)
    R0 = jnp.asarray(R_true)
    p0 = jnp.asarray(p_true + rng.randn(*p_true.shape).astype(np.float32)
                     * 0.02)
    _, _, _, c1 = bam.ba_solve(R0, p0, prob, jnp.asarray(ZFM), iters=4)
    n_dev = min(8, len(jax.devices()))
    mesh = data_mesh(n_dev)
    part = bam.partition_problem(prob, n_dev)
    _, _, _, c2 = bam.ba_solve_sharded(R0, p0, part, jnp.asarray(ZFM),
                                       mesh, iters=4)
    np.testing.assert_allclose(float(c2[0]), float(c1[0]), rtol=1e-4)
    # both reach the same floor (rtol plus an f32 noise-floor atol)
    np.testing.assert_allclose(float(c2[-1]), float(c1[-1]), rtol=0.3,
                               atol=1e-5)


def test_ba_scale_64kf_100k_landmarks():
    """The judged scale demo: 64 keyframes, 1e5 landmarks, 3e5
    observations, landmark axis sharded over the whole mesh; the solve
    converges by orders of magnitude in 3 Gauss-Newton iterations."""
    F, L = 64, 100_000
    R_true, p_true, rho_true, prob = _ring_problem(F, L, 3)
    rng = np.random.RandomState(1)
    R0 = jnp.asarray(R_true)
    p0 = jnp.asarray(p_true + rng.randn(F, 3).astype(np.float32) * 0.03)

    n_dev = min(8, len(jax.devices()))
    mesh = data_mesh(n_dev)
    part = bam.partition_problem(prob, n_dev)
    assert part.rho.shape[0] == L            # divisible: no landmark pad
    R2, p2, rho2, costs = bam.ba_solve_sharded(
        R0, p0, part, jnp.asarray(ZFM), mesh, iters=4)
    costs = np.asarray(costs)            # costs[i] = cost BEFORE iter i
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0] * 2e-3, costs
    # poses actually improved (modulo the monocular similarity gauge)
    from rebvo_tpu.io.trajectory import ate_rmse
    ate0 = ate_rmse(np.asarray(p0), p_true, with_scale=True)
    ate2 = ate_rmse(np.asarray(p2), p_true, with_scale=True)
    assert ate2 < 0.3 * ate0, (ate0, ate2)
