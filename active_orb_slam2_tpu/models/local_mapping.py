"""Local mapping: point culling, local BA window construction, map refresh.

TPU-native redesign of the reference's mapping thread
(``src/LocalMapping.cc``, SURVEY.md §3.3).  The ``Run()`` loop becomes a
jitted ``mapping_step`` invoked by the orchestrator after each keyframe
insertion:

  * ``MapPointCulling`` (~L160): found/visible ratio < 0.25, or stale
    young points with too few observations — batch mask update.
  * local BA window (``Optimizer::LocalBundleAdjustment`` ~L390): local
    cams = new KF + best covisible; fixed cams = other observers of the
    local points; fixed-shape edge lists fed to the Schur BA; outlier
    observations erased from the forward store.
  * point stat refresh (descriptors/normals/scale bounds).

``CreateNewMapPoints`` triangulation (mono) and ``SearchInNeighbors``
fusion arrive with the monocular pipeline; the RGB-D path synthesizes
points at keyframe creation like the reference does.
"""

import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.config import SlamConfig
from active_orb_slam2_tpu.models.map_state import (
    MapState, covisibility_weights, point_observation_count,
    update_point_stats)
from active_orb_slam2_tpu.models.optimizer import BAEdges, bundle_adjustment


def build_mapping_step(cfg: SlamConfig):
    """Compile (m, kf_slot, kf_seq) -> m with culling + local BA applied."""
    cam = cfg.camera
    L = cfg.map.local_ba_keyframes
    Lf = cfg.map.local_ba_keyframes          # fixed ring, same budget
    Pl = cfg.map.local_ba_points

    @jax.jit
    def mapping_step(m: MapState, kf_slot, kf_seq):
        # ---------------- MapPointCulling --------------------------------
        n_obs = point_observation_count(m)
        found_ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(
            m.pt_visible.astype(jnp.float32), 1.0)
        age = kf_seq - m.pt_first_kf
        # The reference culls young points not reobserved within 2-3 KFs
        # (MapPointCulling ~L160 [U]); its KF rate is per-frame-scale,
        # ours is sparser, so the window is "never reobserved by any
        # other KF after 3 KF insertions".
        bad = m.pt_valid & (
            ((m.pt_visible >= 8) & (found_ratio < 0.25))
            | ((age >= 3) & (n_obs <= 1))
        )
        m = m._replace(pt_valid=m.pt_valid & ~bad)
        # erase observations of culled points
        pt = jnp.clip(m.kf_point, 0)
        m = m._replace(kf_point=jnp.where(
            (m.kf_point >= 0) & ~m.pt_valid[pt], -1, m.kf_point))

        # ---------------- local BA window --------------------------------
        W = covisibility_weights(m)
        row = jnp.where(m.kf_valid, W[kf_slot], 0)
        row = row.at[kf_slot].set(0)
        w_loc, loc = jax.lax.top_k(row, L - 1)
        local_cams = jnp.concatenate([jnp.array([kf_slot]), loc])
        local_ok = jnp.concatenate([jnp.array([True]), w_loc > 0])
        local_ok &= m.kf_valid[local_cams]

        # local point set: observed by local cams
        lk_pt = jnp.clip(m.kf_point[local_cams], 0)
        lk_obs = (m.kf_point[local_cams] >= 0) & local_ok[:, None]
        pt_mask = jnp.zeros((m.max_points,), bool).at[
            lk_pt.ravel()].max(lk_obs.ravel()) & m.pt_valid
        pt_sel = jnp.argsort(~pt_mask, stable=True)[:Pl]
        pt_sel_ok = pt_mask[pt_sel]
        loc_of_pt = jnp.full((m.max_points,), -1, jnp.int32).at[
            pt_sel].set(jnp.where(pt_sel_ok,
                                  jnp.arange(Pl, dtype=jnp.int32), -1))

        # fixed cams: observe selected points, not local
        obs_sel = (m.kf_point >= 0) & (loc_of_pt[pt] >= 0)   # [K, F]
        kf_votes = jnp.sum(obs_sel & m.kf_valid[:, None], axis=1)
        is_local = jnp.zeros((m.max_keyframes,), bool).at[
            local_cams].max(local_ok)
        kf_votes = jnp.where(is_local, 0, kf_votes)
        w_fix, fix = jax.lax.top_k(kf_votes, Lf)
        fixed_ok = (w_fix > 0) & m.kf_valid[fix]

        cams = jnp.concatenate([local_cams, fix])            # [Lt]
        cams_ok = jnp.concatenate([local_ok, fixed_ok])
        fixed_flag = jnp.concatenate(
            [jnp.zeros((L,), bool), jnp.ones((Lf,), bool)])
        # gauge: fix the oldest local cam too (reference fixes KFs with
        # id 0 / the fixed ring; with no fixed cams the gauge is free)
        any_fixed = fixed_ok.any()
        oldest = jnp.argmin(jnp.where(
            local_ok, m.kf_frame_id[local_cams], jnp.int32(2**30)))
        fixed_flag = fixed_flag.at[oldest].set(
            fixed_flag[oldest] | ~any_fixed)

        # edges: every (cam, feature) with a selected point
        Lt = L + Lf
        F = m.n_features
        cam_pt = m.kf_point[cams]                            # [Lt, F]
        e_pt_loc = loc_of_pt[jnp.clip(cam_pt, 0)]
        e_valid = ((cam_pt >= 0) & (e_pt_loc >= 0)
                   & cams_ok[:, None] & m.kf_feat_valid[cams])
        e_cam = jnp.broadcast_to(
            jnp.arange(Lt, dtype=jnp.int32)[:, None], (Lt, F))
        obs_uvr = jnp.concatenate(
            [m.kf_uv[cams], m.kf_ur[cams][..., None]], axis=-1)
        edges = BAEdges(
            cam_idx=e_cam.ravel(),
            pt_idx=jnp.clip(e_pt_loc, 0).ravel(),
            obs_uvr=obs_uvr.reshape(-1, 3),
            level=m.kf_level[cams].ravel(),
            has_stereo=(m.kf_ur[cams] > 0).ravel(),
            valid=e_valid.ravel())

        res = bundle_adjustment(
            cam, m.kf_pose[cams], m.pt_xyz[pt_sel], edges,
            fixed_cam=fixed_flag | ~cams_ok)

        # write back: local cam poses + selected points
        write_cam = cams_ok & ~fixed_flag
        m = m._replace(
            kf_pose=m.kf_pose.at[cams].set(
                jnp.where(write_cam[:, None], res.poses, m.kf_pose[cams])),
            pt_xyz=m.pt_xyz.at[pt_sel].set(
                jnp.where(pt_sel_ok[:, None], res.points,
                          m.pt_xyz[pt_sel])))

        # erase outlier observations (reference erases mono/stereo edges
        # past chi2 after the final rounds)
        bad_edge = (edges.valid & ~res.edge_inliers).reshape(Lt, F)
        m = m._replace(kf_point=m.kf_point.at[cams].set(
            jnp.where(bad_edge, -1, m.kf_point[cams])))

        # refresh derived point state
        m = update_point_stats(m)
        return m

    return mapping_step
