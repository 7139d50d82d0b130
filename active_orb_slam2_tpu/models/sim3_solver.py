"""Sim3 estimation between two keyframes: batched Horn RANSAC + refine.

Replaces the reference's ``Sim3Solver`` (``src/Sim3Solver.cc`` [U]):
Horn 1987 closed-form absolute orientation on 3-point minimal sets
inside RANSAC with both-direction reprojection checks.  TPU-native
reformulation (SURVEY.md §7.1): all ``n_hyp`` hypotheses are sampled
with one PRNG call and solved by one batched eigendecomposition; the
adaptive early-exit loop becomes a single argmax over inlier counts,
followed by a weighted-Horn refinement on the winner's inliers.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.geometry.horn import horn_align
from active_orb_slam2_tpu.geometry.projection import CameraParams
from active_orb_slam2_tpu.geometry.se3 import (
    quat_rotate, sim3_apply, sim3_inverse)

CHI2_SIM3 = 9.210   # reference maxError (99% chi2, 2 dof)


class Sim3Result(NamedTuple):
    sim3_ab: jnp.ndarray     # [8] maps b-camera coords -> a-camera coords
    inliers: jnp.ndarray     # [M] bool
    n_inliers: jnp.ndarray   # int32
    ok: jnp.ndarray          # bool


def _project(cam: CameraParams, pc):
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    return jnp.stack([cam.fx * pc[..., 0] / z + cam.cx,
                      cam.fy * pc[..., 1] / z + cam.cy], axis=-1)


def sim3_ransac(key, cam: CameraParams, xyz_a, xyz_b, uv_a, uv_b,
                sigma2_a, sigma2_b, valid, n_hyp: int = 256,
                fix_scale: bool = False, min_inliers: int = 20
                ) -> Sim3Result:
    """Estimate S_ab with dst = a, src = b.

    Args:
      xyz_a/xyz_b [M, 3]: matched points in each keyframe's CAMERA frame
        (the reference's mvX3Dc1/mvX3Dc2).
      uv_a/uv_b [M, 2]: their observed pixels; sigma2_* [M]: per-level
        variance for the chi2 gate (1.2^(2 level)).
      valid [M] bool.
    """
    M = xyz_a.shape[0]
    w = jnp.where(valid, 1.0, 0.0)
    # sample 3 correspondence indices per hypothesis (Gumbel top-k over
    # valid entries -> distinct indices, one shot for all hypotheses)
    g = jax.random.gumbel(key, (n_hyp, M))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, picks = jax.lax.top_k(g, 3)                        # [n_hyp, 3]

    src = xyz_b[picks]                                     # [n_hyp, 3, 3]
    dst = xyz_a[picks]
    q, t, s = horn_align(src, dst, fix_scale=fix_scale)    # batched

    # both-direction reprojection check for every hypothesis x point
    def hyp_inliers(q, t, s):
        pa = s * quat_rotate(q[None], xyz_b) + t[None]     # b -> a frame
        ra = _project(cam, pa) - uv_a
        e_a = jnp.sum(ra * ra, axis=-1) / sigma2_a
        si = 1.0 / jnp.maximum(s, 1e-9)
        qi = q * jnp.array([1.0, -1, -1, -1])
        pb = si * quat_rotate(qi[None], xyz_a - t[None])
        rb = _project(cam, pb) - uv_b
        e_b = jnp.sum(rb * rb, axis=-1) / sigma2_b
        return valid & (e_a < CHI2_SIM3) & (e_b < CHI2_SIM3) \
            & (pa[:, 2] > 0) & (pb[:, 2] > 0)

    inl = jax.vmap(hyp_inliers)(q, t, s)                   # [n_hyp, M]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # refine with weighted Horn on the winner's inliers
    qr, tr, sr = horn_align(xyz_b, xyz_a,
                            weights=best_inl.astype(jnp.float32),
                            fix_scale=fix_scale)
    ref_inl = hyp_inliers(qr, tr, sr)
    use_ref = ref_inl.sum() >= counts[best]
    q_f = jnp.where(use_ref, qr, q[best])
    t_f = jnp.where(use_ref, tr, t[best])
    s_f = jnp.where(use_ref, sr, s[best])
    inl_f = jnp.where(use_ref, ref_inl, best_inl)
    n = inl_f.sum().astype(jnp.int32)
    sim3 = jnp.concatenate([q_f, t_f, s_f[None]])
    return Sim3Result(sim3_ab=sim3, inliers=inl_f, n_inliers=n,
                      ok=n >= min_inliers)
