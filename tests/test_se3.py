"""Unit tests for SE3/Sim3 ops against numpy oracles (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from active_orb_slam2_tpu.geometry import se3


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q * np.where(q[..., :1] < 0, -1, 1)


def np_quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(q.shape[:-1] + (3, 3))


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (32,))
    v = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(se3.quat_rotate(jnp.array(q), jnp.array(v)))
    want = np.einsum('nij,nj->ni', np_quat_to_mat(q), v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_mat_roundtrip(rng):
    q = random_quat(rng, (64,))
    m = se3.quat_to_mat(jnp.array(q))
    q2 = np.asarray(se3.mat_to_quat(m))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-5)


def test_se3_compose_inverse(rng):
    q = random_quat(rng, (16,))
    t = rng.normal(size=(16, 3)).astype(np.float32)
    p = jnp.concatenate([jnp.array(q), jnp.array(t)], axis=-1)
    ident = se3.se3_compose(p, se3.se3_inverse(p))
    np.testing.assert_allclose(np.asarray(ident[..., 4:]), 0, atol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(ident[..., 0])), 1.0, atol=1e-5)


def test_se3_apply_compose_consistent(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    a = jnp.concatenate([jnp.array(q), jnp.array(t)], axis=-1)
    b = jnp.roll(a, 1, axis=0)
    x = jnp.array(rng.normal(size=(8, 3)).astype(np.float32))
    lhs = se3.se3_apply(se3.se3_compose(a, b), x)
    rhs = se3.se3_apply(a, se3.se3_apply(b, x))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    d = rng.normal(size=(32, 6)).astype(np.float32) * 0.5
    p = se3.se3_exp(jnp.array(d))
    d2 = np.asarray(se3.se3_log(p))
    np.testing.assert_allclose(d2, d, atol=1e-4)


def test_se3_exp_small_angle(rng):
    d = rng.normal(size=(8, 6)).astype(np.float32) * 1e-6
    p = np.asarray(se3.se3_exp(jnp.array(d)))
    # Near identity: q ~ [1, w/2], t ~ v
    np.testing.assert_allclose(p[:, 0], 1.0, atol=1e-9)
    np.testing.assert_allclose(p[:, 1:4], d[:, :3] / 2, atol=1e-9)
    np.testing.assert_allclose(p[:, 4:], d[:, 3:], atol=1e-9)


def test_se3_mat44_roundtrip(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    p = jnp.concatenate([jnp.array(q), jnp.array(t)], axis=-1)
    m = se3.se3_to_mat44(p)
    p2 = se3.mat44_to_se3(m)
    x = jnp.array(rng.normal(size=(8, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(se3.se3_apply(p, x)),
                               np.asarray(se3.se3_apply(p2, x)), atol=1e-5)


def test_sim3_compose_apply(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    s = np.exp(rng.normal(size=(8,)).astype(np.float32) * 0.3)
    g = jnp.concatenate([jnp.array(q), jnp.array(t), jnp.array(s[:, None])], -1)
    h = jnp.roll(g, 1, axis=0)
    x = jnp.array(rng.normal(size=(8, 3)).astype(np.float32))
    lhs = se3.sim3_apply(se3.sim3_compose(g, h), x)
    rhs = se3.sim3_apply(g, se3.sim3_apply(h, x))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_sim3_inverse(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    s = np.exp(rng.normal(size=(8,)).astype(np.float32) * 0.3)
    g = jnp.concatenate([jnp.array(q), jnp.array(t), jnp.array(s[:, None])], -1)
    x = jnp.array(rng.normal(size=(8, 3)).astype(np.float32))
    back = se3.sim3_apply(se3.sim3_inverse(g), se3.sim3_apply(g, x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_sim3_exp_log_roundtrip(rng):
    d = rng.normal(size=(32, 7)).astype(np.float32) * 0.4
    g = se3.sim3_exp(jnp.array(d))
    d2 = np.asarray(se3.sim3_log(g))
    np.testing.assert_allclose(d2, d, atol=2e-3)


def test_sim3_exp_zero_is_identity():
    g = np.asarray(se3.sim3_exp(jnp.zeros((7,))))
    np.testing.assert_allclose(g, np.array([1, 0, 0, 0, 0, 0, 0, 1.0]),
                               atol=1e-6)


def test_sim3_exp_matches_numerical_integration(rng):
    """Oracle: W = int_0^1 exp(sigma u) expm(u hat(w)) du via fine Riemann sum."""
    d = rng.normal(size=(7,)).astype(np.float32) * 0.7
    w, v, sig = d[:3], d[3:6], d[6]

    def hat(w):
        return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])

    def expm(A):
        out = np.eye(3)
        term = np.eye(3)
        for k in range(1, 20):
            term = term @ A / k
            out = out + term
        return out

    us = (np.arange(20000) + 0.5) / 20000
    W = sum(np.exp(sig * u) * expm(u * hat(w)) for u in us) / len(us)
    t_ref = W @ v
    g = np.asarray(se3.sim3_exp(jnp.array(d)))
    np.testing.assert_allclose(g[4:7], t_ref, atol=1e-3)
    np.testing.assert_allclose(g[7], np.exp(sig), atol=1e-4)


def test_se3_retract_is_left_multiplicative(rng):
    q = random_quat(rng, ())
    t = rng.normal(size=(3,)).astype(np.float32)
    p = jnp.concatenate([jnp.array(q), jnp.array(t)])
    d = jnp.array(rng.normal(size=(6,)).astype(np.float32) * 0.1)
    got = se3.se3_retract(p, d)
    want = se3.se3_compose(se3.se3_exp(d), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
