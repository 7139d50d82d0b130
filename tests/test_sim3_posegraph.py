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


def test_optimize_sim3_beats_horn_under_depth_noise(rng):
    """Optimizer::OptimizeSim3 parity (round-2 verdict item 8): LM over
    bidirectional PROJECTION residuals must recover a tighter relative
    Sim3 than the weighted-Horn 3D refit when the 3D points carry
    depth noise but the pixel observations are clean."""
    import jax.numpy as jnp
    from active_orb_slam2_tpu.geometry import CameraParams
    from active_orb_slam2_tpu.geometry.horn import horn_align
    from active_orb_slam2_tpu.geometry.se3 import (
        quat_rotate, sim3_apply, sim3_compose, sim3_inverse, sim3_log)
    from active_orb_slam2_tpu.models.sim3_solver import optimize_sim3

    cam = CameraParams(fx=260.0, fy=260.0, cx=159.5, cy=119.5, bf=20.8,
                       width=320, height=240)
    M = 200
    # ground-truth Sim3 b->a
    th = 0.3
    q = jnp.array([np.cos(th / 2), 0.0, np.sin(th / 2), 0.0], jnp.float32)
    s_true = jnp.concatenate([q, jnp.array([0.4, -0.1, 0.2]),
                              jnp.array([1.07])])
    pts_b = jnp.asarray(rng.uniform([-1.5, -1, 3], [1.5, 1, 8],
                                    (M, 3)).astype(np.float32))
    pts_a = sim3_apply(s_true, pts_b)

    def project(p):
        return jnp.stack([cam.fx * p[:, 0] / p[:, 2] + cam.cx,
                          cam.fy * p[:, 1] / p[:, 2] + cam.cy], axis=-1)

    uv_a = project(pts_a)          # clean pixels
    uv_b = project(pts_b)
    # depth noise: scale each point's CAMERA-frame position along the
    # ray (pure depth error, pixels unchanged)
    zs_a = 1.0 + 0.05 * rng.standard_normal(M).astype(np.float32)
    zs_b = 1.0 + 0.05 * rng.standard_normal(M).astype(np.float32)
    noisy_a = pts_a * jnp.asarray(zs_a)[:, None]
    noisy_b = pts_b * jnp.asarray(zs_b)[:, None]

    valid = jnp.ones((M,), bool)
    s2 = jnp.ones((M,), jnp.float32)

    qh, th_, sh = horn_align(noisy_b, noisy_a,
                             weights=valid.astype(jnp.float32))
    s_horn = jnp.concatenate([qh, th_, sh[None]])
    s_opt, inl, n = optimize_sim3(cam, s_horn, noisy_a, noisy_b,
                                  uv_a, uv_b, s2, s2, valid)

    def err(s):
        return float(jnp.linalg.norm(sim3_log(
            sim3_compose(s, sim3_inverse(s_true)))))

    e_horn, e_opt = err(s_horn), err(s_opt)
    assert int(n) > 100
    assert e_opt < 0.5 * e_horn, (e_horn, e_opt)
    assert e_opt < 0.02, e_opt
