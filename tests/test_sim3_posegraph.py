"""Sim3 RANSAC + essential-graph optimizer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.geometry import (
    CameraParams, sim3_apply, sim3_compose, sim3_exp, sim3_inverse,
    sim3_log, sim3_identity, se3_identity)
from active_orb_slam2_tpu.models.sim3_solver import sim3_ransac
from active_orb_slam2_tpu.models.pose_graph import (
    Sim3Edges, optimize_essential_graph, build_essential_edges)

CAM = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                   width=640, height=480)


def _project_np(pc):
    return np.stack([525.0 * pc[:, 0] / pc[:, 2] + 319.5,
                     525.0 * pc[:, 1] / pc[:, 2] + 239.5], axis=-1)


def test_sim3_ransac_recovers(rng):
    M = 80
    xyz_b = rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (M, 3)).astype(np.float32)
    g_true = sim3_exp(jnp.array([0.05, -0.1, 0.08, 0.4, -0.2, 0.3, 0.15],
                                jnp.float32))
    xyz_a = np.asarray(sim3_apply(g_true, jnp.array(xyz_b)))
    # corrupt 25% of correspondences
    bad = rng.random(M) < 0.25
    xyz_b_noisy = xyz_b.copy()
    xyz_b_noisy[bad] = rng.uniform([-2, -1.5, 3], [2, 1.5, 8],
                                   (bad.sum(), 3))
    uv_a = _project_np(xyz_a)
    uv_b = _project_np(xyz_b_noisy)
    res = sim3_ransac(
        jax.random.PRNGKey(0), CAM,
        jnp.array(xyz_a), jnp.array(xyz_b_noisy),
        jnp.array(uv_a), jnp.array(uv_b),
        jnp.ones(M), jnp.ones(M), jnp.ones(M, bool))
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[bad].sum() <= 2
    assert inl[~bad].mean() > 0.9
    err = sim3_log(sim3_compose(res.sim3_ab, sim3_inverse(g_true)))
    assert float(jnp.linalg.norm(err)) < 1e-2


def test_sim3_ransac_fix_scale(rng):
    M = 40
    xyz_b = rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (M, 3)).astype(np.float32)
    g_true = sim3_exp(jnp.array([0.0, 0.0, 0.1, 0.3, 0.1, 0.0, 0.0],
                                jnp.float32))
    xyz_a = np.asarray(sim3_apply(g_true, jnp.array(xyz_b)))
    res = sim3_ransac(
        jax.random.PRNGKey(1), CAM,
        jnp.array(xyz_a), jnp.array(xyz_b),
        jnp.array(_project_np(xyz_a)), jnp.array(_project_np(xyz_b)),
        jnp.ones(M), jnp.ones(M), jnp.ones(M, bool), fix_scale=True)
    assert bool(res.ok)
    assert abs(float(res.sim3_ab[7]) - 1.0) < 1e-6


def test_pose_graph_closes_loop(rng):
    """Classic drift correction: chain of 8 poses with accumulated
    drift, a loop edge back to the start; optimization spreads the
    error (reference OptimizeEssentialGraph behaviour)."""
    K = 8
    # true: poses around a ring, increments measured exactly
    inc_true = sim3_exp(jnp.array([0.0, 0.0, 2 * np.pi / K,
                                   0.8, 0.0, 0.0, 0.0], jnp.float32))
    S_true = [sim3_identity()]
    for _ in range(K - 1):
        S_true.append(sim3_compose(inc_true, S_true[-1]))
    # estimated: drift added to each increment
    drift = sim3_exp(jnp.array([0, 0, 0.03, 0.05, 0, 0, 0.01], jnp.float32))
    inc_drift = sim3_compose(drift, inc_true)
    S_est = [sim3_identity()]
    for _ in range(K - 1):
        S_est.append(sim3_compose(inc_drift, S_est[-1]))
    S_est = jnp.stack(S_est)
    S_true_s = jnp.stack(S_true)

    # edges: chain with the DRIFTED relative measurements (consistent
    # with estimates) + one loop edge with the TRUE relative transform
    ii = jnp.arange(K - 1, dtype=jnp.int32)
    jj = ii + 1
    chain_meas = jnp.stack([sim3_compose(S_est[i + 1],
                                         sim3_inverse(S_est[i]))
                            for i in range(K - 1)])
    loop_meas = sim3_compose(S_true_s[K - 1],
                             sim3_inverse(S_true_s[0]))[None]
    edges = Sim3Edges(
        i=jnp.concatenate([ii, jnp.array([0], jnp.int32)]),
        j=jnp.concatenate([jj, jnp.array([K - 1], jnp.int32)]),
        meas_ji=jnp.concatenate([chain_meas, loop_meas]),
        valid=jnp.ones(K, bool),
        weight=jnp.concatenate([jnp.ones(K - 1), jnp.array([5.0])]))
    fixed = jnp.zeros(K, bool).at[0].set(True)
    S_opt, chi2 = optimize_essential_graph(S_est, edges, fixed, iters=30)
    # loop edge must now be (nearly) satisfied
    r_loop = sim3_log(sim3_compose(
        sim3_inverse(loop_meas[0]),
        sim3_compose(S_opt[K - 1], sim3_inverse(S_opt[0]))))
    drift_before = sim3_log(sim3_compose(
        sim3_inverse(loop_meas[0]),
        sim3_compose(S_est[K - 1], sim3_inverse(S_est[0]))))
    assert float(jnp.linalg.norm(r_loop)) < 0.15 * float(
        jnp.linalg.norm(drift_before))
    # end pose closer to truth than before
    err_before = jnp.linalg.norm(sim3_log(sim3_compose(
        S_est[K - 1], sim3_inverse(S_true_s[K - 1]))))
    err_after = jnp.linalg.norm(sim3_log(sim3_compose(
        S_opt[K - 1], sim3_inverse(S_true_s[K - 1]))))
    assert float(err_after) < 0.5 * float(err_before)


def test_build_essential_edges(rng):
    K = 6
    sim3s = jnp.tile(sim3_identity()[None], (K, 1))
    kf_valid = jnp.ones(K, bool)
    parent = jnp.array([-1, 0, 1, 2, 3, 4], jnp.int32)
    W = jnp.zeros((K, K), jnp.int32).at[0, 5].set(150).at[5, 0].set(150)
    loop_i = jnp.array([2, -1], jnp.int32)
    loop_j = jnp.array([4, -1], jnp.int32)
    e = build_essential_edges(sim3s, kf_valid, parent, W, loop_i, loop_j,
                              max_strong=4)
    v = np.asarray(e.valid)
    # 5 tree edges + 1 strong covis + 1 loop
    assert v.sum() == 7
