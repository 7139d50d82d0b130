"""SE(3) / Sim(3) rigid + similarity transforms on flat arrays.

Replaces the reference's ``g2o::SE3Quat`` / ``g2o::Sim3``
(``Thirdparty/g2o/g2o/types/se3quat.h``, ``sim3.h`` [U]) and the
``cv::Mat`` 4x4 pose convention used throughout ``src/Tracking.cc`` /
``src/KeyFrame.cc`` [U].

Representation
--------------
* SE3 pose: 7-vector ``[qw, qx, qy, qz, tx, ty, tz]`` (unit quaternion,
  translation).  Acts as ``x_out = R(q) @ x + t``.  SLAM convention:
  ``Tcw`` maps world -> camera.
* Sim3: 8-vector ``[qw, qx, qy, qz, tx, ty, tz, s]`` acting as
  ``x_out = s * R @ x + t`` (matches g2o's Sim3: scale applied with
  rotation, translation unscaled).
* Tangent (twist): SE3 ``[v(3), w(3)]`` translation-first, matching
  g2o's SE3Quat::exp ordering is [w, v]; we use [w, v] too so Jacobian
  blocks stay comparable: ``delta = [omega(3), nu(3)]``.
  Sim3 tangent: ``[omega(3), nu(3), sigma(1)]``.

All functions are elementwise in the leading axes (broadcast/vmap-safe)
and jit-stable.  float32 throughout.
"""

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------- quaternions

def quat_normalize(q):
    """Normalize quaternion(s) [..., 4]; guards the zero quaternion."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_mul(a, b):
    """Hamilton product a*b, both [..., 4] = [w, x, y, z]."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4].

    Uses the 15-mul formulation: v' = v + 2*qv x (qv x v + qw*v).
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v) + qw * v
    return v + 2.0 * jnp.cross(qv, uv)


def quat_to_mat(q):
    """Quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w >= 0).

    Branch-free Shepperd: compute all four candidate quaternions and
    select the numerically best by the largest diagonal combination —
    jit/vmap-safe (no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 (>= 0).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    cand = jnp.stack([
        jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
        jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1),
        jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1),
        jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1),
    ], axis=-2)  # [..., 4(cand), 4]
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_from_axis_angle(axis, angle):
    """Unit axis [..., 3], angle [...] -> quaternion."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def _so3_exp(w):
    """so(3) vector [..., 3] -> quaternion, Taylor-safe near zero."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-8
    # sin(t/2)/t and cos(t/2)
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(0.5 * theta) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(0.5 * theta))
    return jnp.concatenate([cw, k * w], axis=-1)


def _so3_log(q):
    """Quaternion -> so(3) vector [..., 3]."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # w >= 0 branch
    qv = q[..., 1:]
    sin_half = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    cos_half = q[..., :1]
    angle = 2.0 * jnp.arctan2(sin_half, cos_half)
    small = sin_half < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(cos_half, _EPS),
                      angle / jnp.maximum(sin_half, _EPS))
    return scale * qv


def _hat(w):
    """[..., 3] -> skew matrix [..., 3, 3]."""
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        z, -w[..., 2], w[..., 1],
        w[..., 2], z, -w[..., 0],
        -w[..., 1], w[..., 0], z,
    ], axis=-1).reshape(w.shape[:-1] + (3, 3))


def _left_jacobian_so3(w):
    """SO(3) left Jacobian J_l(w) [..., 3, 3] (Taylor-safe)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = _hat(w)
    W2 = W @ W
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


# ---------------------------------------------------------------------- SE(3)

def se3_identity(shape=()):
    out = jnp.zeros(shape + (7,), dtype=jnp.float32)
    return out.at[..., 0].set(1.0)


def se3_compose(a, b):
    """(a*b)(x) = a(b(x)); both [..., 7]."""
    q = quat_mul(a[..., :4], b[..., :4])
    t = quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def se3_inverse(p):
    qi = quat_conj(p[..., :4])
    ti = -quat_rotate(qi, p[..., 4:7])
    return jnp.concatenate([qi, ti], axis=-1)


def se3_apply(p, x):
    """Apply pose [..., 7] to point(s) [..., 3]."""
    return quat_rotate(p[..., :4], x) + p[..., 4:7]


def se3_exp(delta):
    """Twist [..., 6] = [omega, nu] -> SE3 [..., 7] (exact exp map)."""
    w, v = delta[..., :3], delta[..., 3:6]
    q = _so3_exp(w)
    t = jnp.einsum('...ij,...j->...i', _left_jacobian_so3(w), v)
    return jnp.concatenate([q, t], axis=-1)


def se3_log(p):
    """SE3 [..., 7] -> twist [..., 6] = [omega, nu]."""
    w = _so3_log(p[..., :4])
    Jl = _left_jacobian_so3(w)
    from active_orb_slam2_tpu.geometry.linalg3 import solve3
    v = solve3(Jl, p[..., 4:7], eps=1e-30)
    return jnp.concatenate([w, v], axis=-1)


def se3_retract(p, delta):
    """Left-multiplicative GN update: exp(delta) * p.

    This is the update used by every optimizer here (PoseOptimization,
    local/global BA — reference ``src/Optimizer.cc`` uses g2o's
    SE3Quat::exp update on VertexSE3Expmap [U]).
    """
    return se3_compose(se3_exp(delta), p)


def se3_to_mat44(p):
    R = quat_to_mat(p[..., :4])
    t = p[..., 4:7]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype),
        p.shape[:-1] + (4,))[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def mat44_to_se3(m):
    q = mat_to_quat(m[..., :3, :3])
    return jnp.concatenate([q, m[..., :3, 3]], axis=-1)


# ---------------------------------------------------------------------- Sim(3)

def sim3_identity(shape=()):
    out = jnp.zeros(shape + (8,), dtype=jnp.float32)
    return out.at[..., 0].set(1.0).at[..., 7].set(1.0)


def sim3_from_se3(p, s=None):
    """SE3 [..., 7] (+ optional scale [...]) -> Sim3 [..., 8]."""
    if s is None:
        s = jnp.ones(p.shape[:-1], dtype=p.dtype)
    return jnp.concatenate([p, s[..., None]], axis=-1)


def sim3_to_se3(g):
    """Drop scale: returns ([...,7] SE3 with t := t/s trick NOT applied).

    Matches LoopClosing::CorrectLoop's recovery ``Tiw = [R, t/s]``
    (reference ``src/Optimizer.cc`` OptimizeEssentialGraph tail [U]):
    the SE3 with translation divided by scale.
    """
    q = g[..., :4]
    t = g[..., 4:7] / jnp.maximum(g[..., 7:8], _EPS)
    return jnp.concatenate([q, t], axis=-1)


def sim3_apply(g, x):
    """x' = s*R x + t."""
    return g[..., 7:8] * quat_rotate(g[..., :4], x) + g[..., 4:7]


def sim3_compose(a, b):
    """(a*b)(x) = a(b(x)): R=Ra Rb, s=sa sb, t = sa Ra tb + ta."""
    q = quat_normalize(quat_mul(a[..., :4], b[..., :4]))
    s = a[..., 7:8] * b[..., 7:8]
    t = a[..., 7:8] * quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    return jnp.concatenate([q, t, s], axis=-1)


def sim3_inverse(g):
    qi = quat_conj(g[..., :4])
    si = 1.0 / jnp.maximum(g[..., 7:8], _EPS)
    ti = -si * quat_rotate(qi, g[..., 4:7])
    return jnp.concatenate([qi, ti, si], axis=-1)


def sim3_exp(delta):
    """Sim3 tangent [..., 7] = [omega, nu, sigma] -> Sim3 [..., 8].

    Exact W-matrix form (as in g2o sim3.h [U]): t = W(omega, sigma) nu,
    s = exp(sigma).  W computed Taylor-safely.
    """
    w, v, sig = delta[..., :3], delta[..., 3:6], delta[..., 6]
    s = jnp.exp(sig)
    q = _so3_exp(w)

    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = _hat(w)
    W2 = W @ W
    sig_ = sig[..., None, None]
    s_ = s[..., None, None]
    th_ = theta[..., None, None]
    th2_ = theta2[..., None, None]

    small_sig = jnp.abs(sig_) < 1e-5
    small_th = th2_ < 1e-8

    # A = coefficient of I, B of W, C of W^2 in W-matrix
    A = jnp.where(small_sig, 1.0 + sig_ / 2.0, (s_ - 1.0) / jnp.where(small_sig, 1.0, sig_))
    denom = sig_ * sig_ + th2_
    denom = jnp.maximum(denom, _EPS)
    sin_t = jnp.sin(th_)
    cos_t = jnp.cos(th_)
    # general-case B, C (both sig and theta non-tiny)
    Bg = (s_ * sin_t * sig_ + (1.0 - s_ * cos_t) * th_) / (th_ * denom)
    Cg = (A - ((s_ * cos_t - 1.0) * sig_ + s_ * sin_t * th_) / denom) / jnp.maximum(th2_, _EPS)
    # sigma ~ 0 limits: B -> (1-cos)/th2, C -> (th - sin)/th^3
    B0 = (1.0 - cos_t) / jnp.maximum(th2_, _EPS)
    C0 = (th_ - sin_t) / jnp.maximum(th2_ * th_, _EPS)
    B = jnp.where(small_sig, B0, Bg)
    C = jnp.where(small_sig, C0, Cg)
    # theta ~ 0 limits (from W = int_0^1 e^{sig u} e^{u hat(w)} du Taylor):
    #   B -> (s*sig - s + 1)/sig^2,  C -> (s*(sig^2-2sig+2) - 2)/(2 sig^3)
    sig_safe = jnp.where(small_sig, 1.0, sig_)
    Bt = jnp.where(small_sig, 0.5 + sig_ / 3.0,
                   (s_ * sig_ - s_ + 1.0) / (sig_safe * sig_safe))
    Ct = jnp.where(small_sig, 1.0 / 6.0 + sig_ / 8.0,
                   (s_ * (sig_ * sig_ - 2.0 * sig_ + 2.0) - 2.0)
                   / (2.0 * sig_safe ** 3))
    B = jnp.where(small_th, Bt, B)
    C = jnp.where(small_th, Ct, C)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=delta.dtype), W.shape)
    Wm = A * eye + B * W + C * W2
    t = jnp.einsum('...ij,...j->...i', Wm, v)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_log(g):
    """Sim3 [..., 8] -> tangent [..., 7]; inverts sim3_exp numerically.

    Uses closed-form omega/sigma and solves the 3x3 W system for nu.
    """
    w = _so3_log(g[..., :4])
    sig = jnp.log(jnp.maximum(g[..., 7], _EPS))
    # Rebuild W from (w, sig) by calling sim3_exp pieces on unit nu basis:
    basis = jnp.eye(3, dtype=g.dtype)
    def col(i):
        d = jnp.concatenate(
            [w, jnp.broadcast_to(basis[i], w.shape), sig[..., None]], axis=-1)
        return sim3_exp(d)[..., 4:7]
    Wm = jnp.stack([col(0), col(1), col(2)], axis=-1)
    from active_orb_slam2_tpu.geometry.linalg3 import solve3
    v = solve3(Wm, g[..., 4:7], eps=1e-30)
    return jnp.concatenate([w, v, sig[..., None]], axis=-1)
