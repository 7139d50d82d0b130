"""Relocalization tests: PnP RANSAC and the lost-recovery path."""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (run with -m slow)

import numpy as np
import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.geometry import (
    CameraParams, project, se3_apply, se3_compose, se3_exp, se3_inverse,
    se3_log)
from active_orb_slam2_tpu.models.relocalization import pnp_dlt, pnp_ransac

CAM = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                   width=640, height=480)


def test_pnp_dlt_exact(rng):
    pw = rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (12, 3)).astype(np.float32)
    T = se3_exp(jnp.array([0.1, -0.2, 0.15, 0.3, 0.1, -0.2], jnp.float32))
    uv, _ = project(CAM, se3_apply(T, jnp.array(pw)))
    xn = jnp.stack([(uv[:, 0] - CAM.cx) / CAM.fx,
                    (uv[:, 1] - CAM.cy) / CAM.fy], axis=-1)
    pose = pnp_dlt(jnp.array(pw), xn)
    err = se3_log(se3_compose(pose, se3_inverse(T)))
    assert float(jnp.linalg.norm(err)) < 1e-3, np.asarray(err)


def test_pnp_ransac_with_outliers(rng):
    M = 120
    pw = rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (M, 3)).astype(np.float32)
    T = se3_exp(jnp.array([0.05, -0.1, 0.08, 0.2, 0.0, -0.1], jnp.float32))
    uv, _ = project(CAM, se3_apply(T, jnp.array(pw)))
    uv = np.asarray(uv).copy()
    bad = rng.random(M) < 0.3
    uv[bad] += rng.uniform(30, 100, (bad.sum(), 2))
    pose, inl, n = pnp_ransac(
        jax.random.PRNGKey(0), CAM, jnp.array(pw), jnp.array(uv),
        jnp.zeros(M, jnp.int32), jnp.ones(M, bool))
    inl = np.asarray(inl)
    assert inl[bad].sum() <= 2
    assert inl[~bad].mean() > 0.9
    err = se3_log(se3_compose(pose, se3_inverse(T)))
    assert float(jnp.linalg.norm(err)) < 5e-3


def test_system_relocalizes_after_blackout(rng):
    """Feed garbage frames mid-sequence (camera covered), then resume:
    the system must go LOST and relocalize."""
    from tests.test_e2e_rgbd import CAM as SCAM, CFG
    from active_orb_slam2_tpu.io.synthetic import (
        default_world, make_sequence, orbit_trajectory)
    from active_orb_slam2_tpu.models.system import LOST, OK, System

    N = 26
    frames = list(make_sequence(
        N, SCAM, world=default_world(),
        trajectory=orbit_trajectory(N, step_deg=2.0)))
    slam = System(CFG, use_loop_closing=True)
    for i in range(18):
        slam.track_rgbd(*frames[i][:2], i / 30.0)
    assert slam.state == OK
    kf_before = slam.kf_seq
    # blackout: flat frames, no features
    black = np.zeros_like(frames[0][0])
    zdep = np.zeros_like(frames[0][1])
    for j in range(3):
        slam.track_rgbd(black, zdep, (18 + j) / 30.0)
    assert slam.state == LOST
    # resume near frame 16's viewpoint
    for i in range(16, 18):
        slam.track_rgbd(*frames[i][:2], (22 + i - 16) / 30.0)
    assert slam.state == OK, "failed to relocalize"
    assert int(slam.track.n_inliers) > 50
