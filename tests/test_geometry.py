"""Tests for projection, triangulation, Horn alignment."""

import numpy as np
import jax.numpy as jnp

from active_orb_slam2_tpu.geometry import (
    CameraParams, project, project_stereo, backproject, in_frustum,
    predict_scale, triangulate_pairs, horn_align, umeyama_alignment,
    se3_identity, se3_exp, se3_apply, quat_rotate,
)

CAM = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                   width=640, height=480)


def test_project_backproject_roundtrip(rng):
    pc = rng.uniform(0.5, 5.0, size=(64, 3)).astype(np.float32)
    pc[:, :2] = rng.normal(size=(64, 2)) * 0.5
    uv, z = project(CAM, jnp.array(pc))
    back = backproject(CAM, uv, z)
    np.testing.assert_allclose(np.asarray(back), pc, atol=1e-4)


def test_project_stereo_disparity():
    pc = jnp.array([[0.0, 0.0, 2.0]])
    uvr, z = project_stereo(CAM, pc)
    uvr = np.asarray(uvr)[0]
    assert abs(uvr[0] - 319.5) < 1e-4
    assert abs((uvr[0] - uvr[2]) - 40.0 / 2.0) < 1e-4  # disparity = bf/z


def test_triangulation_exact(rng):
    pw = rng.uniform(-1, 1, size=(32, 3)).astype(np.float32)
    pw[:, 2] += 4.0
    T1 = se3_identity()
    T2 = se3_exp(jnp.array([0.02, -0.01, 0.03, 0.3, 0.0, 0.05]))
    uv1, _ = project(CAM, se3_apply(T1, jnp.array(pw)))
    uv2, _ = project(CAM, se3_apply(T2, jnp.array(pw)))
    xw, ok = triangulate_pairs(CAM.K, T1, T2, uv1, uv2)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(xw), pw, atol=1e-2)


def test_horn_align_recovers_sim3(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    q_true = np.array([0.9, 0.1, -0.3, 0.2], dtype=np.float32)
    q_true /= np.linalg.norm(q_true)
    s_true, t_true = 1.7, np.array([0.3, -1.0, 2.0], dtype=np.float32)
    dst = s_true * np.asarray(
        quat_rotate(jnp.array(q_true), jnp.array(src))) + t_true
    q, t, s = horn_align(jnp.array(src), jnp.array(dst))
    assert abs(float(s) - s_true) < 1e-4
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)
    got = float(s) * np.asarray(quat_rotate(q, jnp.array(src))) + np.asarray(t)
    np.testing.assert_allclose(got, dst, atol=1e-3)


def test_horn_align_fix_scale(rng):
    src = rng.normal(size=(30, 3)).astype(np.float32)
    dst = src + np.array([1.0, 2.0, 3.0], dtype=np.float32)
    q, t, s = horn_align(jnp.array(src), jnp.array(dst), fix_scale=True)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(t), [1, 2, 3], atol=1e-4)


def test_horn_align_weighted_ignores_outliers(rng):
    src = rng.normal(size=(40, 3)).astype(np.float32)
    dst = src + 1.0
    dst_bad = dst.copy()
    dst_bad[:5] += 100.0  # gross outliers
    w = np.ones(40, dtype=np.float32)
    w[:5] = 0.0
    q, t, s = horn_align(jnp.array(src), jnp.array(dst_bad), jnp.array(w))
    np.testing.assert_allclose(np.asarray(t), [1, 1, 1], atol=1e-3)


def test_umeyama_rmse_zero_for_exact(rng):
    src = rng.normal(size=(20, 3)).astype(np.float32)
    _, _, _, _, rmse = umeyama_alignment(jnp.array(src), jnp.array(src * 2.0))
    assert float(rmse) < 1e-4


def test_in_frustum(rng):
    pw = np.array([
        [0.0, 0.0, 2.0],    # dead center -> visible
        [0.0, 0.0, -2.0],   # behind
        [10.0, 0.0, 2.0],   # out of image
        [0.0, 0.0, 2.0],    # bad viewing angle (normal flipped)
    ], dtype=np.float32)
    normal = np.array([[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, -1]],
                      dtype=np.float32)
    T = se3_identity()
    ok, uv, z, dist, vcos = in_frustum(
        CAM, T, jnp.array(pw), jnp.array(normal),
        jnp.full(4, 0.1), jnp.full(4, 100.0))
    np.testing.assert_array_equal(np.asarray(ok), [True, False, False, False])


def test_predict_scale():
    # At max_dist -> level 0; closer -> higher level.
    lv = predict_scale(jnp.array([10.0, 10.0 / 1.2 ** 3]), 10.0, 1.2, 8)
    np.testing.assert_array_equal(np.asarray(lv), [0, 3])
