"""Horn's closed-form absolute orientation + Umeyama Sim3 alignment.

Two consumers, mirroring the reference:
  * ``Sim3Solver::ComputeSim3`` (``src/Sim3Solver.cc`` [U]) — Horn 1987
    quaternion method on 3-point minimal sets inside loop-closure RANSAC.
  * Trajectory evaluation (ATE): the TUM benchmark's alignment, which the
    reference relies on externally (SURVEY.md §4) — built in-repo here.

Both are batched: horn_align works on [..., N, 3] point sets so the
Sim3 RANSAC evaluates all K hypotheses in one shot.
"""

import jax.numpy as jnp

from active_orb_slam2_tpu.geometry.se3 import mat_to_quat


def horn_align(src, dst, weights=None, fix_scale: bool = False):
    """Closed-form similarity transform dst ~ s * R @ src + t.

    Horn 1987 quaternion method (the same algorithm as the reference's
    Sim3Solver [U]), batched over leading axes.

    Args:
      src, dst: [..., N, 3] corresponding points.
      weights: optional [..., N] nonneg weights (masked RANSAC sets).
      fix_scale: True for stereo/RGB-D (s=1), as in the reference's
        ``bFixScale`` flag.
    Returns:
      (q [...,4], t [...,3], s [...]) with dst ≈ s*R(q)@src + t.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    wn = weights / wsum                                     # [..., N]
    mu_s = jnp.sum(wn[..., None] * src, axis=-2)            # [..., 3]
    mu_d = jnp.sum(wn[..., None] * dst, axis=-2)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]

    # Weighted correlation  S_ab = sum w * cs_a cd_b  -> [..., 3, 3]
    # (src-major order: Horn's l=src, r=dst convention; transposing this
    # yields the inverse rotation.)
    M = jnp.einsum('...n,...ni,...nj->...ij', wn, cs, cd)

    # Horn's 4x4 N-matrix; max eigenvector = rotation quaternion.
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx,
        Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz,
        Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy,
        Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz,
    ], axis=-1).reshape(M.shape[:-2] + (4, 4))
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, -1]                                    # largest eigval
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)

    # Rotate centered src by q, then scale = <cd, R cs> / <cs, cs>
    from active_orb_slam2_tpu.geometry.se3 import quat_rotate
    rs = quat_rotate(q[..., None, :], cs)
    if fix_scale:
        s = jnp.ones(q.shape[:-1], dtype=src.dtype)
    else:
        num = jnp.sum(wn * jnp.sum(cd * rs, axis=-1), axis=-1)
        den = jnp.maximum(jnp.sum(wn * jnp.sum(rs * rs, axis=-1), axis=-1), 1e-12)
        s = num / den
    t = mu_d - s[..., None] * quat_rotate(q, mu_s)
    return q, t, s


def umeyama_alignment(src, dst, fix_scale: bool = False):
    """ATE-style alignment returning (aligned_src, q, t, s, rmse).

    The in-repo equivalent of TUM benchmark ``evaluate_ate.py`` alignment
    (SURVEY.md §4 item 2): align estimated trajectory positions to
    ground truth with a similarity (mono) or rigid (stereo/RGB-D)
    transform and report RMSE.
    """
    from active_orb_slam2_tpu.geometry.se3 import quat_rotate
    q, t, s = horn_align(src, dst, fix_scale=fix_scale)
    aligned = s[..., None, None] * quat_rotate(q[..., None, :], src) + t[..., None, :]
    err = jnp.linalg.norm(aligned - dst, axis=-1)
    rmse = jnp.sqrt(jnp.mean(err * err, axis=-1))
    return aligned, q, t, s, rmse
