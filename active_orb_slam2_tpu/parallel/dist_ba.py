"""Global bundle adjustment — point-major layout, single-device and
sharded over a device mesh.

This is the build's distributed-BA substrate (SURVEY.md §2.5, §5.7 and
the BASELINE.json north star): the reference's
``Optimizer::GlobalBundleAdjustemnt`` (``src/Optimizer.cc`` ~L30-220
[U], single-node Eigen Cholesky inside g2o) redesigned for a TPU pod
slice:

  * **Point-major edges**: every point carries its observer list
    (camera slot, observation) up to a cap O — built from the arena's
    forward store with one sort.  A point's whole Schur elimination is
    then local to wherever the point lives.
  * **Sharding**: points are partitioned across the mesh axis.  Each
    shard eliminates its points and accumulates partial reduced camera
    systems S_partial [K*6, K*6] and gradients; one ``psum`` over ICI
    combines them; the reduced solve is replicated (identical on every
    device); point back-substitution is shard-local.  The only
    communication per LM iteration is the psum of (S, g, chi2) —
    exactly the 'psum of reduced camera Hessians' the north star
    prescribes.
  * The O x O coupling blocks are accumulated with an unrolled loop of
    small scatter-adds (no [P*O^2, 6, 6] materialization).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from active_orb_slam2_tpu.geometry.projection import CameraParams
from active_orb_slam2_tpu.geometry.se3 import se3_retract
from active_orb_slam2_tpu.models.map_state import MapState
from active_orb_slam2_tpu.models.optimizer import (
    CHI2_MONO, CHI2_STEREO, _edge_residual_jac, _huber_weight, inv_sigma2)


class PointEdges(NamedTuple):
    """Observer lists: for each point, up to O observations."""
    cam: jnp.ndarray         # [P, O] int32 keyframe slot (0 if invalid)
    obs_uvr: jnp.ndarray     # [P, O, 3]
    level: jnp.ndarray       # [P, O] int32
    has_stereo: jnp.ndarray  # [P, O] bool
    valid: jnp.ndarray       # [P, O] bool


def build_point_major_edges(m: MapState, max_obs: int = 12) -> PointEdges:
    """Invert the forward store kf_point [K, F] into per-point observer
    lists [P, O] with one sort (device-side, jit-safe)."""
    K, F = m.kf_point.shape
    Pn = m.max_points
    flat_pt = m.kf_point.ravel()
    ok = (flat_pt >= 0) & m.kf_valid.repeat(F) & m.kf_feat_valid.ravel()
    key = jnp.where(ok, flat_pt, Pn)                     # invalid last
    order = jnp.argsort(key, stable=True)
    sorted_pt = key[order]
    # rank within the point's run: position - first occurrence
    first = jnp.searchsorted(sorted_pt, jnp.arange(Pn + 1), side="left")
    rank = jnp.arange(K * F) - first[jnp.clip(sorted_pt, 0, Pn)]
    keep = (sorted_pt < Pn) & (rank < max_obs)
    dst_p = jnp.where(keep, sorted_pt, Pn - 1)
    dst_o = jnp.where(keep, rank, 0).astype(jnp.int32)

    kf_ids = (order // F).astype(jnp.int32)
    ft_ids = (order % F).astype(jnp.int32)
    uv = m.kf_uv[kf_ids, ft_ids]
    ur = m.kf_ur[kf_ids, ft_ids]
    obs = jnp.concatenate([uv, ur[:, None]], axis=-1)

    def scat(init, val):
        return init.at[dst_p, dst_o].max(jnp.where(
            keep.reshape((-1,) + (1,) * (val.ndim - 1)), val,
            jnp.zeros_like(val)))

    cam = jnp.zeros((Pn, max_obs), jnp.int32).at[dst_p, dst_o].max(
        jnp.where(keep, kf_ids, -1))
    obs_uvr = jnp.zeros((Pn, max_obs, 3)).at[dst_p, dst_o].add(
        jnp.where(keep[:, None], obs, 0.0))
    level = jnp.zeros((Pn, max_obs), jnp.int32).at[dst_p, dst_o].max(
        jnp.where(keep, m.kf_level[kf_ids, ft_ids], 0))
    stereo = jnp.zeros((Pn, max_obs), bool).at[dst_p, dst_o].max(
        keep & (ur > 0))
    valid = jnp.zeros((Pn, max_obs), bool).at[dst_p, dst_o].max(keep)
    return PointEdges(cam=jnp.maximum(cam, 0), obs_uvr=obs_uvr,
                      level=level, has_stereo=stereo, valid=valid)


def _shard_reduced_system(cam: CameraParams, poses, points, e: PointEdges,
                          inlier, lam, max_obs: int):
    """One shard's contribution: (S [K6, K6], g [K6], Hpp_inv, bp, A, chi2).

    ``points``/``e``/``inlier`` may be a shard of the point axis; poses
    are replicated.
    """
    K = poses.shape[0]
    Pn, O = e.cam.shape
    pose_e = poses[e.cam.ravel()]
    pw = jnp.repeat(points, O, axis=0)
    r, Jc, Jx, zpos = _edge_residual_jac(
        cam, pose_e, pw, e.obs_uvr.reshape(-1, 3), e.has_stereo.ravel())
    w_info = inv_sigma2(e.level.ravel())
    c2 = w_info * jnp.sum(r * r, axis=-1)
    w = w_info * _huber_weight(c2, e.has_stereo.ravel())
    w = jnp.where(e.valid.ravel() & inlier.ravel() & zpos, w, 0.0)

    chi2 = jnp.sum(jnp.where(w > 0, c2, 0.0))
    A = jnp.einsum('eai,e,eaj->eij', Jc, w, Jx).reshape(Pn, O, 6, 3)
    Hcc_e = jnp.einsum('eai,e,eaj->eij', Jc, w, Jc)
    bc_e = -jnp.einsum('eai,e,ea->ei', Jc, w, r)
    Hpp = jnp.einsum('eai,e,eaj->eij', Jx, w, Jx).reshape(
        Pn, O, 3, 3).sum(1)
    bp = -jnp.einsum('eai,e,ea->ei', Jx, w, r).reshape(Pn, O, 3).sum(1)

    eye3 = jnp.eye(3)
    Hpp_d = Hpp + lam * Hpp * eye3 + 1e-6 * eye3
    from active_orb_slam2_tpu.geometry.linalg3 import inv3
    Hpp_inv = inv3(Hpp_d, eps=1e-30)

    C = jnp.einsum('poij,pjk->poik', A, Hpp_inv)          # [Pn, O, 6, 3]

    # S = sum_cam Hcc (diag) - sum_p C A^T, accumulated as 6x6 blocks in
    # a [K*K] flattened block array via O^2 small scatter-adds.
    S_blocks = jnp.zeros((K * K, 6, 6))
    cam_ids = e.cam
    for o1 in range(max_obs):
        for o2 in range(max_obs):
            contrib = jnp.einsum('pik,pjk->pij', C[:, o1], A[:, o2])
            idx = cam_ids[:, o1] * K + cam_ids[:, o2]
            S_blocks = S_blocks.at[idx].add(-contrib)
    # diagonal Hcc blocks (pose-pose edges don't exist)
    S_blocks = S_blocks.at[e.cam.ravel() * (K + 1)].add(Hcc_e)
    # reduced gradient: g = bc - sum_p C bp
    red = jnp.einsum('poik,pk->poi', C, bp)               # [Pn, O, 6]
    g = jnp.zeros((K, 6)).at[e.cam.ravel()].add(
        bc_e - red.reshape(Pn * O, 6))

    S = S_blocks.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(
        K * 6, K * 6)
    return S, g.reshape(K * 6), Hpp_inv, bp, A, chi2


def _apply_cam_solution(poses, dc):
    return jax.vmap(se3_retract)(poses, dc.reshape(-1, 6))


def _back_substitute(Hpp_inv, bp, A, e: PointEdges, dc_blocks):
    """dp = Hpp_inv (bp - sum_o A[p,o]^T dc[cam[p,o]]) — shard-local."""
    dce = dc_blocks[e.cam]                                 # [Pn, O, 6]
    corr = jnp.einsum('poij,poi->pj', A, dce)
    return jnp.einsum('pij,pj->pi', Hpp_inv, bp - corr)


def _pin_fixed(S, g, fixed_mask):
    K6 = S.shape[0]
    rows = jnp.repeat(fixed_mask, 6)
    S = jnp.where(rows[:, None] | rows[None, :], jnp.eye(K6), S)
    g = jnp.where(rows, 0.0, g)
    return S, g


def global_ba(cam: CameraParams, poses, kf_valid, points, pt_valid,
              e: PointEdges, fixed_mask, iters: int = 10,
              max_obs: int = 12, lam0: float = 1e-4):
    """Single-device point-major global BA (GlobalBundleAdjustemnt [U]).

    fixed_mask [K] bool — cameras pinned (reference fixes KF 0).
    Returns (poses, points, chi2).
    """
    fixed = fixed_mask | ~kf_valid
    inlier = e.valid & pt_valid[:, None]

    def body(carry, _):
        poses, points, lam, _ = carry
        S, g, Hpp_inv, bp, A, chi2_old = _shard_reduced_system(
            cam, poses, points, e, inlier, lam, max_obs)
        S, g = _pin_fixed(S, g, fixed)
        dc = jnp.linalg.solve(S, g)
        dc_blocks = dc.reshape(-1, 6) * (~fixed)[:, None]
        new_poses = _apply_cam_solution(poses, dc_blocks.reshape(-1))
        dp = _back_substitute(Hpp_inv, bp, A, e, dc_blocks)
        new_points = points + dp * pt_valid[:, None]
        # accept/reject on total chi2
        _, _, _, _, _, chi2_new = _shard_reduced_system(
            cam, new_poses, new_points, e, inlier, lam, max_obs)
        accept = chi2_new <= chi2_old
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e2)
        return (poses, points, lam, jnp.where(accept, chi2_new, chi2_old)), None

    (poses, points, _, chi2), _ = jax.lax.scan(
        body, (poses, points, jnp.float32(lam0), jnp.float32(0.0)),
        None, length=iters)
    return poses, points, chi2


def build_distributed_ba(mesh: Mesh, cam: CameraParams, iters: int = 10,
                         max_obs: int = 12, axis: str = "shard"):
    """Compile the sharded global BA step over ``mesh``.

    Points (and their observer lists) are partitioned along ``axis``;
    keyframe poses are replicated.  Per LM iteration the only collective
    is one psum of (S, g, chi2) over ICI.

    Returns fn(poses, kf_valid, points, pt_valid, edges, fixed_mask)
      -> (poses, points, chi2); inputs may live on host — they are
      device_put with the right shardings.
    """
    pspec = P(axis)
    rspec = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(rspec, rspec, pspec, pspec,
                  PointEdges(pspec, pspec, pspec, pspec, pspec), rspec),
        out_specs=(rspec, pspec, rspec),
        check_vma=False)
    def sharded_ba(poses, kf_valid, points, pt_valid, e, fixed_mask):
        fixed = fixed_mask | ~kf_valid
        inlier = e.valid & pt_valid[:, None]

        def body(carry, _):
            poses, points, lam, _ = carry
            S, g, Hpp_inv, bp, A, chi2_old = _shard_reduced_system(
                cam, poses, points, e, inlier, lam, max_obs)
            # ICI collective: combine shard-partial reduced systems
            S = jax.lax.psum(S, axis)
            g = jax.lax.psum(g, axis)
            chi2_old = jax.lax.psum(chi2_old, axis)
            S, g = _pin_fixed(S, g, fixed)
            dc = jnp.linalg.solve(S, g)              # replicated solve
            dc_blocks = dc.reshape(-1, 6) * (~fixed)[:, None]
            new_poses = _apply_cam_solution(poses, dc_blocks.reshape(-1))
            dp = _back_substitute(Hpp_inv, bp, A, e, dc_blocks)
            new_points = points + dp * pt_valid[:, None]
            _, _, _, _, _, chi2_new = _shard_reduced_system(
                cam, new_poses, new_points, e, inlier, lam, max_obs)
            chi2_new = jax.lax.psum(chi2_new, axis)
            accept = chi2_new <= chi2_old
            poses = jnp.where(accept, new_poses, poses)
            points = jnp.where(accept, new_points, points)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-8, 1e2)
            return (poses, points, lam,
                    jnp.where(accept, chi2_new, chi2_old)), None

        (poses, points, _, chi2), _ = jax.lax.scan(
            body, (poses, points, jnp.float32(1e-4), jnp.float32(0.0)),
            None, length=iters)
        return poses, points, chi2

    @jax.jit
    def run(poses, kf_valid, points, pt_valid, e: PointEdges, fixed_mask):
        return sharded_ba(poses, kf_valid, points, pt_valid, e, fixed_mask)

    return run
