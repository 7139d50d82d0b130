"""Distributed BA correctness: sharded result == single-device result
(SURVEY.md §4: fake 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.config import MapConfig, OrbConfig
from active_orb_slam2_tpu.geometry import (
    CameraParams, project_stereo, se3_apply, se3_compose, se3_exp,
    se3_identity, se3_inverse, se3_log)
from active_orb_slam2_tpu.models.map_state import empty_map
from active_orb_slam2_tpu.parallel import (
    PointEdges, build_distributed_ba, build_point_major_edges, global_ba,
    make_mesh)

CAM = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                   width=640, height=480)


def make_problem(rng, K=8, Pn=256, O=6, noise=0.3):
    """Synthetic multi-view problem in point-major layout."""
    pts = rng.uniform([-2, -1.5, 3], [2, 1.5, 9], (Pn, 3)).astype(np.float32)
    poses = [se3_identity()]
    for i in range(K - 1):
        poses.append(se3_compose(
            se3_exp(jnp.array([0.01, -0.02, 0.01, 0.3, 0.02, 0.05],
                              jnp.float32)), poses[-1]))
    poses = jnp.stack(poses)
    cams = rng.integers(0, K, size=(Pn, O)).astype(np.int32)
    obs = np.zeros((Pn, O, 3), np.float32)
    for p in range(Pn):
        for o in range(O):
            uvr, _ = project_stereo(
                CAM, se3_apply(poses[cams[p, o]], jnp.array(pts[p])))
            obs[p, o] = np.asarray(uvr)
    obs += rng.normal(size=obs.shape).astype(np.float32) * noise
    e = PointEdges(cam=jnp.array(cams), obs_uvr=jnp.array(obs),
                   level=jnp.zeros((Pn, O), jnp.int32),
                   has_stereo=jnp.ones((Pn, O), bool),
                   valid=jnp.ones((Pn, O), bool))
    return poses, jnp.array(pts), e


def perturb(rng, poses, pts):
    dp = jnp.array(rng.normal(size=(poses.shape[0], 6)).astype(np.float32)
                   * 0.01)
    poses0 = jax.vmap(se3_compose)(jax.vmap(se3_exp)(dp), poses)
    poses0 = poses0.at[0].set(poses[0])
    pts0 = pts + jnp.array(rng.normal(size=pts.shape).astype(np.float32)
                           * 0.05)
    return poses0, pts0


def test_global_ba_converges(rng):
    poses, pts, e = make_problem(rng)
    poses0, pts0 = perturb(rng, poses, pts)
    K, Pn = poses.shape[0], pts.shape[0]
    fixed = jnp.zeros(K, bool).at[0].set(True)
    out_poses, out_pts, chi2 = global_ba(
        CAM, poses0, jnp.ones(K, bool), pts0, jnp.ones(Pn, bool), e,
        fixed, iters=10, max_obs=6)
    for c in range(1, K):
        err = se3_log(se3_compose(out_poses[c], se3_inverse(poses[c])))
        assert float(jnp.linalg.norm(err)) < 3e-3, c


def test_distributed_matches_single_device(rng):
    poses, pts, e = make_problem(rng)
    poses0, pts0 = perturb(rng, poses, pts)
    K, Pn = poses.shape[0], pts.shape[0]
    kf_valid = jnp.ones(K, bool)
    pt_valid = jnp.ones(Pn, bool)
    fixed = jnp.zeros(K, bool).at[0].set(True)

    single = global_ba(CAM, poses0, kf_valid, pts0, pt_valid, e, fixed,
                       iters=5, max_obs=6)

    mesh = make_mesh(8)
    dist_fn = build_distributed_ba(mesh, CAM, iters=5, max_obs=6)
    dist = dist_fn(poses0, kf_valid, pts0, pt_valid, e, fixed)

    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(dist[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(single[1]), np.asarray(dist[1]),
                               atol=2e-3)


def test_point_major_edges_from_map(rng):
    """Observer-list inversion of the forward store."""
    m = empty_map(MapConfig(max_keyframes=8, max_points=64),
                  OrbConfig(n_features=16))
    m = m._replace(
        kf_valid=m.kf_valid.at[:3].set(True),
        kf_feat_valid=m.kf_feat_valid.at[:3].set(True),
        pt_valid=m.pt_valid.at[:4].set(True),
        kf_point=m.kf_point
        .at[0, 0].set(0).at[0, 1].set(1)
        .at[1, 3].set(0).at[1, 4].set(2)
        .at[2, 5].set(0),
        kf_uv=m.kf_uv.at[0, 0].set(jnp.array([10.0, 20.0]))
        .at[1, 3].set(jnp.array([30.0, 40.0]))
        .at[2, 5].set(jnp.array([50.0, 60.0])),
    )
    e = build_point_major_edges(m, max_obs=4)
    # point 0 observed by KFs 0, 1, 2
    assert int(e.valid[0].sum()) == 3
    cams0 = set(np.asarray(e.cam[0])[np.asarray(e.valid[0])].tolist())
    assert cams0 == {0, 1, 2}
    # observations carried over correctly (sorted by kf slot)
    uvs = np.asarray(e.obs_uvr[0, :3, :2])
    assert {tuple(u) for u in uvs.tolist()} == {
        (10.0, 20.0), (30.0, 40.0), (50.0, 60.0)}
    # point 1: single obs; point 3: none
    assert int(e.valid[1].sum()) == 1
    assert int(e.valid[3].sum()) == 0


def test_point_major_obs_cap(rng):
    """More observers than the cap -> truncated, not corrupted."""
    m = empty_map(MapConfig(max_keyframes=8, max_points=16),
                  OrbConfig(n_features=4))
    m = m._replace(
        kf_valid=m.kf_valid.at[:6].set(True),
        kf_feat_valid=m.kf_feat_valid.at[:6].set(True),
        pt_valid=m.pt_valid.at[0].set(True),
        kf_point=m.kf_point.at[:6, 0].set(0),
    )
    e = build_point_major_edges(m, max_obs=4)
    assert int(e.valid[0].sum()) == 4
