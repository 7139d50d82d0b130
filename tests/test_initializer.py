"""Monocular initializer tests: F path (general scene), H path (planar)."""

import numpy as np
import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.geometry import (
    CameraParams, project, se3_apply, se3_compose, se3_exp, se3_identity,
    se3_inverse, se3_log, quat_rotate)
from active_orb_slam2_tpu.models.initializer import build_initializer

CAM = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=0.0,
                   width=640, height=480)


def _project_two(pw, T2, noise, rng):
    uv1, z1 = project(CAM, jnp.array(pw))
    uv2, z2 = project(CAM, se3_apply(T2, jnp.array(pw)))
    uv1 = np.asarray(uv1) + rng.normal(size=(len(pw), 2)) * noise
    uv2 = np.asarray(uv2) + rng.normal(size=(len(pw), 2)) * noise
    return jnp.array(uv1, jnp.float32), jnp.array(uv2, jnp.float32)


def _pose_dir_error(pose2, T2_true):
    """Rotation error + translation DIRECTION error (mono scale-free)."""
    r_err = se3_log(se3_compose(
        jnp.concatenate([pose2[:4], jnp.zeros(3)]),
        se3_inverse(jnp.concatenate([T2_true[:4], jnp.zeros(3)]))))[:3]
    t_est = pose2[4:7] / jnp.maximum(jnp.linalg.norm(pose2[4:7]), 1e-9)
    t_true = T2_true[4:7] / jnp.maximum(jnp.linalg.norm(T2_true[4:7]), 1e-9)
    return float(jnp.linalg.norm(r_err)), float(
        1.0 - jnp.abs(jnp.sum(t_est * t_true)))


def test_initializer_general_scene(rng):
    pw = rng.uniform([-2, -1.5, 3], [2, 1.5, 9], (300, 3)).astype(np.float32)
    T2 = se3_exp(jnp.array([0.02, -0.03, 0.01, 0.4, 0.05, 0.1], jnp.float32))
    uv1, uv2 = _project_two(pw, T2, 0.5, rng)
    init = build_initializer(CAM)
    res = init(jax.random.PRNGKey(0), uv1, uv2, jnp.ones(300, bool))
    assert bool(res.ok)
    assert not bool(res.used_h)       # general scene -> fundamental
    r_err, t_err = _pose_dir_error(res.pose2, T2)
    assert r_err < 0.01 and t_err < 1e-3, (r_err, t_err)
    assert int(res.point_ok.sum()) > 200


def test_initializer_planar_scene(rng):
    """Points on a plane -> homography model must win and reconstruct."""
    xy = rng.uniform([-2, -1.5], [2, 1.5], (300, 2)).astype(np.float32)
    pw = np.concatenate(
        [xy, (5.0 + 0.3 * xy[:, :1] + 0.2 * xy[:, 1:])], axis=1)
    T2 = se3_exp(jnp.array([0.03, -0.02, 0.02, 0.5, 0.1, 0.05], jnp.float32))
    uv1, uv2 = _project_two(pw, T2, 0.4, rng)
    init = build_initializer(CAM)
    res = init(jax.random.PRNGKey(1), uv1, uv2, jnp.ones(300, bool))
    assert bool(res.ok)
    assert bool(res.used_h)
    r_err, t_err = _pose_dir_error(res.pose2, T2)
    assert r_err < 0.02 and t_err < 5e-3, (r_err, t_err)


def test_initializer_rejects_pure_rotation(rng):
    """No-translation case: parallax gate must refuse."""
    pw = rng.uniform([-2, -1.5, 3], [2, 1.5, 9], (300, 3)).astype(np.float32)
    T2 = se3_exp(jnp.array([0.02, -0.03, 0.04, 0.0, 0.0, 0.0], jnp.float32))
    uv1, uv2 = _project_two(pw, T2, 0.3, rng)
    init = build_initializer(CAM)
    res = init(jax.random.PRNGKey(2), uv1, uv2, jnp.ones(300, bool))
    assert not bool(res.ok)


def test_initializer_with_outliers(rng):
    pw = rng.uniform([-2, -1.5, 3], [2, 1.5, 9], (300, 3)).astype(np.float32)
    T2 = se3_exp(jnp.array([0.02, -0.03, 0.01, 0.4, 0.05, 0.1], jnp.float32))
    uv1, uv2 = _project_two(pw, T2, 0.4, rng)
    uv2 = np.asarray(uv2).copy()
    bad = rng.random(300) < 0.3
    uv2[bad] = rng.uniform([0, 0], [640, 480], (bad.sum(), 2))
    init = build_initializer(CAM)
    res = init(jax.random.PRNGKey(3), jnp.array(uv1), jnp.array(uv2),
               jnp.ones(300, bool))
    assert bool(res.ok)
    r_err, t_err = _pose_dir_error(res.pose2, T2)
    assert r_err < 0.02 and t_err < 2e-3
    assert np.asarray(res.point_ok)[bad].sum() <= 3
