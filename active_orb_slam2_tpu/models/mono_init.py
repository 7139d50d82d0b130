"""Monocular bootstrap: initial matching + two-keyframe map creation.

``Tracking::MonocularInitialization`` + ``CreateInitialMapMonocular``
(``src/Tracking.cc`` ~L570-720 [U]): windowed feature matching against
the reference frame, the H/F initializer race (models/initializer), a
two-keyframe map with the triangulated points, a global BA over it, and
the median-depth scale normalization that fixes the monocular gauge.
"""

import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.config import SlamConfig
from active_orb_slam2_tpu.geometry.se3 import se3_identity
from active_orb_slam2_tpu.models.map_state import MapState, allocate_slots
from active_orb_slam2_tpu.models.optimizer import BAEdges, bundle_adjustment
from active_orb_slam2_tpu.ops.matching import hamming_matrix, match_mutual


def build_mono_matcher(cfg: SlamConfig, window: float = 100.0,
                       ratio: float = 0.9):
    """``ORBmatcher::SearchForInitialization`` [U]: windowed + ratio."""

    @jax.jit
    def match(frame_ref, frame_cur):
        d = hamming_matrix(frame_ref.desc, frame_cur.desc,
                           frame_ref.valid, frame_cur.valid)
        du = frame_ref.uv[:, 0:1] - frame_cur.uv[None, :, 0]
        dv = frame_ref.uv[:, 1:2] - frame_cur.uv[None, :, 1]
        within = (du * du + dv * dv) <= window * window
        d = jnp.where(within, d, 1e9)
        idx, dist = match_mutual(d, max_dist=50.0, ratio=ratio)
        # HISTO_LENGTH rotation-consistency discipline — the reference
        # applies ComputeThreeMaxima in SearchForInitialization
        # (src/ORBmatcher.cc [U]; round-2 verdict item 6)
        from active_orb_slam2_tpu.ops.matching import (
            rotation_consistency_mask)
        keep = rotation_consistency_mask(frame_ref.angle,
                                         frame_cur.angle, idx)
        idx = jnp.where(keep, idx, -1)
        return idx, (idx >= 0).sum()

    return match


def build_create_initial_map(cfg: SlamConfig):
    """Write the two-KF initial map and run the init global BA."""
    cam = cfg.camera

    @jax.jit
    def create(m: MapState, frame_ref, frame_cur, pose2, points,
               point_ok, match_idx):
        F = m.n_features
        # median-depth normalization (reference: scale so that the
        # median scene depth in KF0 is 1)
        z = jnp.where(point_ok, points[:, 2], jnp.nan)
        med = jnp.nanmedian(z)
        scale = 1.0 / jnp.maximum(med, 1e-6)
        points = points * scale
        pose2 = pose2.at[4:7].multiply(scale)

        slots, free = allocate_slots(m.pt_valid, F)
        create_pt = point_ok & free

        vec = points                                      # from KF0 at origin
        dist = jnp.linalg.norm(vec, axis=-1)
        normal = vec / jnp.maximum(dist[:, None], 1e-9)
        lv = frame_ref.level.astype(jnp.float32)
        max_d = dist * (1.2 ** lv)
        min_d = max_d / (1.2 ** 7)

        def wr(arr, idx, val, mask):
            return arr.at[idx].set(jnp.where(
                mask.reshape((-1,) + (1,) * (val.ndim - 1)), val, arr[idx]))

        m = m._replace(
            pt_xyz=wr(m.pt_xyz, slots, points, create_pt),
            pt_desc=wr(m.pt_desc, slots, frame_ref.desc, create_pt),
            pt_normal=wr(m.pt_normal, slots, normal, create_pt),
            pt_min_dist=wr(m.pt_min_dist, slots, min_d, create_pt),
            pt_max_dist=wr(m.pt_max_dist, slots,
                           jnp.maximum(max_d, 1e-3), create_pt),
            pt_valid=m.pt_valid.at[slots].set(
                jnp.where(create_pt, True, m.pt_valid[slots])),
            pt_visible=wr(m.pt_visible, slots, jnp.ones_like(slots),
                          create_pt),
            pt_found=wr(m.pt_found, slots, jnp.ones_like(slots),
                        create_pt),
            pt_first_kf=wr(m.pt_first_kf, slots,
                           jnp.zeros_like(slots), create_pt),
        )

        kp0 = jnp.where(create_pt, slots, -1)
        kp1 = jnp.full((F,), -1, jnp.int32)
        tgt = jnp.clip(match_idx, 0)
        kp1 = kp1.at[tgt].max(jnp.where(create_pt, slots, -1))

        def write_kf(m, k, frame, pose, kfp, parent):
            return m._replace(
                kf_pose=m.kf_pose.at[k].set(pose),
                kf_valid=m.kf_valid.at[k].set(True),
                kf_frame_id=m.kf_frame_id.at[k].set(k),
                kf_uv=m.kf_uv.at[k].set(frame.uv),
                kf_ur=m.kf_ur.at[k].set(frame.ur),
                kf_level=m.kf_level.at[k].set(frame.level),
                kf_angle=m.kf_angle.at[k].set(frame.angle),
                kf_desc=m.kf_desc.at[k].set(frame.desc),
                kf_feat_valid=m.kf_feat_valid.at[k].set(frame.valid),
                kf_depth=m.kf_depth.at[k].set(frame.depth),
                kf_point=m.kf_point.at[k].set(kfp),
                kf_parent=m.kf_parent.at[k].set(parent),
            )

        m = write_kf(m, 0, frame_ref, se3_identity(), kp0, -1)
        m = write_kf(m, 1, frame_cur, pose2, kp1, 0)

        # init global BA (reference: GlobalBundleAdjustemnt 20 iters)
        cam_idx = jnp.concatenate([jnp.zeros(F, jnp.int32),
                                   jnp.ones(F, jnp.int32)])
        pt_loc = jnp.concatenate([jnp.arange(F), jnp.arange(F)])
        obs0 = jnp.concatenate([frame_ref.uv,
                                jnp.full((F, 1), -1.0)], -1)
        uv1g = frame_cur.uv[tgt]
        obs1 = jnp.concatenate([uv1g, jnp.full((F, 1), -1.0)], -1)
        edges = BAEdges(
            cam_idx=cam_idx,
            pt_idx=pt_loc,
            obs_uvr=jnp.concatenate([obs0, obs1], 0),
            level=jnp.concatenate([frame_ref.level,
                                   frame_cur.level[tgt]]),
            has_stereo=jnp.zeros(2 * F, bool),
            valid=jnp.concatenate([create_pt, create_pt]))
        poses2 = jnp.stack([se3_identity(), pose2])
        res = bundle_adjustment(
            cam, poses2, m.pt_xyz[slots], edges,
            fixed_cam=jnp.array([True, False]),
            iters_a=10, iters_b=10)
        m = m._replace(
            kf_pose=m.kf_pose.at[1].set(res.poses[1]),
            pt_xyz=m.pt_xyz.at[slots].set(
                jnp.where(create_pt[:, None], res.points,
                          m.pt_xyz[slots])))
        n_pts = create_pt.sum().astype(jnp.int32)
        return m, kp1, res.poses[1], n_pts

    return create
