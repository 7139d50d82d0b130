"""Loop-closing machinery test with constructed drift.

RGB-D tracking on clean synthetic data drifts by millimetres, so small
loops get absorbed by local-map re-association (implicit closure) and
the explicit loop path never fires organically in a short test.  Here
we force it: two arcs of the same circle are tracked as separate
sessions, a known SE3 drift is applied to the second arc's world, the
arenas are merged (disjoint slots, duplicate landmarks), and the loop
closer must (1) detect the revisit via BoW, (2) recover the drift via
Sim3 RANSAC, (3) correct the second arc onto the first.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from active_orb_slam2_tpu.config import (
    MapConfig, OrbConfig, SlamConfig, TrackingConfig)
from active_orb_slam2_tpu.geometry import (
    CameraParams, se3_apply, se3_compose, se3_exp, se3_inverse, se3_log)
from active_orb_slam2_tpu.io.synthetic import (
    default_world, loop_trajectory, make_sequence)
from active_orb_slam2_tpu.models.loop_closing import LoopCloser
from active_orb_slam2_tpu.models.system import System

CAM = CameraParams(fx=260.0, fy=260.0, cx=159.5, cy=119.5, bf=20.8,
                   width=320, height=240)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=512, n_levels=4),
    tracking=TrackingConfig(th_depth=12.0),
    map=MapConfig(max_keyframes=64, max_points=8192,
                  local_ba_keyframes=8, local_ba_points=2048))

N = 150
DRIFT = se3_exp(jnp.array([0.0, 0.06, 0.0, 0.25, 0.1, -0.15], jnp.float32))


def _track_arc(frames, start_ts):
    slam = System(CFG)
    for i, (g, d, _) in enumerate(frames):
        slam.track_rgbd(g, d, start_ts + i / 30.0)
    return slam


def _merge_with_drift(slam_a, slam_b, drift):
    """Concatenate arenas; apply ``drift`` to arc B's world."""
    ma, mb = slam_a.map, slam_b.map
    # prefix sizes: last used slot + 1 (holes from culling stay inside)
    Ka = int(np.where(np.asarray(ma.kf_valid))[0].max()) + 1
    Pa = int(np.where(np.asarray(ma.pt_valid))[0].max()) + 1
    drift_inv = se3_inverse(drift)
    pose_b = jax.vmap(lambda p: se3_compose(p, drift_inv))(mb.kf_pose)
    xyz_b = se3_apply(drift, mb.pt_xyz)

    m = ma
    Kb = int(np.where(np.asarray(mb.kf_valid))[0].max()) + 1
    Pb = int(np.where(np.asarray(mb.pt_valid))[0].max()) + 1
    sl_k = slice(Ka, Ka + Kb)
    sl_p = slice(Pa, Pa + Pb)
    kfp_b = np.asarray(mb.kf_point[:Kb])
    kfp_b = np.where(kfp_b >= 0, kfp_b + Pa, -1)
    par_b = np.asarray(mb.kf_parent[:Kb])
    par_b = np.where(par_b >= 0, par_b + Ka, -1)

    def cat(field, new_rows, sl):
        arr = np.asarray(getattr(m, field)).copy()
        arr[sl] = new_rows
        return jnp.asarray(arr)

    m = m._replace(
        kf_pose=cat("kf_pose", np.asarray(pose_b[:Kb]), sl_k),
        kf_valid=cat("kf_valid", np.asarray(mb.kf_valid[:Kb]), sl_k),
        kf_frame_id=cat("kf_frame_id", np.asarray(mb.kf_frame_id[:Kb]),
                        sl_k),
        kf_uv=cat("kf_uv", np.asarray(mb.kf_uv[:Kb]), sl_k),
        kf_ur=cat("kf_ur", np.asarray(mb.kf_ur[:Kb]), sl_k),
        kf_level=cat("kf_level", np.asarray(mb.kf_level[:Kb]), sl_k),
        kf_angle=cat("kf_angle", np.asarray(mb.kf_angle[:Kb]), sl_k),
        kf_desc=cat("kf_desc", np.asarray(mb.kf_desc[:Kb]), sl_k),
        kf_feat_valid=cat("kf_feat_valid",
                          np.asarray(mb.kf_feat_valid[:Kb]), sl_k),
        kf_depth=cat("kf_depth", np.asarray(mb.kf_depth[:Kb]), sl_k),
        kf_point=cat("kf_point", kfp_b, sl_k),
        kf_parent=cat("kf_parent", par_b, sl_k),
        pt_xyz=cat("pt_xyz", np.asarray(xyz_b[:Pb]), sl_p),
        pt_desc=cat("pt_desc", np.asarray(mb.pt_desc[:Pb]), sl_p),
        pt_normal=cat("pt_normal", np.asarray(
            jax.vmap(lambda v: se3_apply(drift, v) - drift[4:7])(
                mb.pt_normal)[:Pb]), sl_p),
        pt_min_dist=cat("pt_min_dist", np.asarray(mb.pt_min_dist[:Pb]),
                        sl_p),
        pt_max_dist=cat("pt_max_dist", np.asarray(mb.pt_max_dist[:Pb]),
                        sl_p),
        pt_valid=cat("pt_valid", np.asarray(mb.pt_valid[:Pb]), sl_p),
        pt_visible=cat("pt_visible", np.asarray(mb.pt_visible[:Pb]), sl_p),
        pt_found=cat("pt_found", np.asarray(mb.pt_found[:Pb]), sl_p),
        pt_first_kf=cat("pt_first_kf",
                        np.asarray(mb.pt_first_kf[:Pb]) + 100, sl_p),
    )
    return m, Ka, Kb


@pytest.fixture(scope="module")
def loop_setup():
    from active_orb_slam2_tpu.geometry import mat44_to_se3
    world = default_world(n_boxes=0)
    traj = loop_trajectory(N, radius=2.5)
    frames = list(make_sequence(N, CAM, world=world, trajectory=traj))
    # arc A: first 55 frames; arc B: the last 55 plus a wrap past the
    # loop point (the circle closes at frame N, so frames 0..19 replay
    # the start) — several consecutive arc-B keyframes genuinely
    # revisit arc A, which is what the reference's 3-consecutive
    # consistency check requires before accepting a loop.
    slam_a = _track_arc(frames[:55], 0.0)
    slam_b = _track_arc(frames[95:] + frames[:20], 95 / 30.0)
    m, Ka, Kb = _merge_with_drift(slam_a, slam_b, DRIFT)
    # each System's world frame is its first camera; x_A = A x_B with
    # A = Twc(0)^-1 Twc(95) from ground truth
    A = mat44_to_se3(jnp.array(np.linalg.inv(traj[0]) @ traj[95]))
    return m, Ka, Kb, A


@pytest.mark.slow
def test_loop_detect_and_correct(loop_setup):
    m, Ka, Kb, A = loop_setup
    m0 = m
    lc = LoopCloser(CFG, recent_frames_guard=0)
    closed = False
    cur = Ka + Kb - 1
    # feed the last few arc-B keyframes to satisfy the consistency check
    for n, k in enumerate(range(Ka + Kb - 8, Ka + Kb)):
        m2, closed = lc.process_keyframe(m, k, kf_seq=20 + n)
        if closed:
            cur = k
            m = m2
            break
        m = m2
    assert closed, "loop was never closed"
    # the corrected arc-B pose must land near its ground-truth pose
    # expressed in arc A's frame: truth = (drifted ∘ DRIFT) ∘ A^-1
    truth = se3_compose(se3_compose(m0.kf_pose[cur], DRIFT),
                        se3_inverse(A))
    err_before = float(jnp.linalg.norm(se3_log(
        se3_compose(m0.kf_pose[cur], se3_inverse(truth)))))
    err_after = float(jnp.linalg.norm(se3_log(
        se3_compose(m.kf_pose[cur], se3_inverse(truth)))))
    assert err_after < 0.15 * err_before, (err_before, err_after)
    assert err_after < 0.5, err_after


def test_loop_rejects_without_consistency(loop_setup):
    """A single detection must not trigger a correction."""
    m, Ka, Kb, _ = loop_setup
    lc = LoopCloser(CFG, recent_frames_guard=0)
    _, closed = lc.process_keyframe(m, Ka + Kb - 1, kf_seq=20)
    assert not closed


def test_score_query_sparse_matches_dense(rng):
    """LoopCloser.score_query dispatches to the sparse BoW path for
    big vocabularies; its scores must match the dense computation."""
    import jax.numpy as jnp
    from active_orb_slam2_tpu.config import (
        MapConfig, OrbConfig, SlamConfig, TrackingConfig)
    from active_orb_slam2_tpu.geometry import CameraParams
    from active_orb_slam2_tpu.models.loop_closing import LoopCloser
    from active_orb_slam2_tpu.models.map_state import empty_map
    from active_orb_slam2_tpu.models.vocabulary import (
        Vocabulary, _full_tree_children, l1_score, transform)

    cam = CameraParams(fx=100., fy=100., cx=32., cy=32., bf=10.,
                       width=64, height=64)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=64, n_levels=2),
                     tracking=TrackingConfig(),
                     map=MapConfig(max_keyframes=4, max_points=256))
    # synthetic full tree with > 4096 words to trigger the sparse path
    k, depth = 9, 4
    n_nodes = sum(k ** (l + 1) for l in range(depth))
    centers = rng.integers(0, 2**32, (n_nodes, 8), dtype=np.uint32)
    children, word_id = _full_tree_children(k, depth)
    voc = Vocabulary(centers=jnp.asarray(centers),
                     children=jnp.asarray(children),
                     word_id=jnp.asarray(word_id),
                     idf=jnp.ones((k ** depth,), jnp.float32),
                     k=k, depth=depth)
    assert voc.n_words > 4096

    lc = LoopCloser(cfg)
    lc.vocab = voc
    m = empty_map(cfg.map, cfg.orb)
    desc = rng.integers(0, 2**32, (4, 64, 8), dtype=np.uint32)
    m = m._replace(
        kf_desc=jnp.asarray(desc),
        kf_feat_valid=jnp.ones((4, 64), bool),
        kf_valid=jnp.ones((4,), bool))
    q_desc = jnp.asarray(desc[1])
    q_valid = jnp.ones((64,), bool)
    s_sparse = np.asarray(lc.score_query(m, q_desc, q_valid))

    _, bow_q = transform(voc, q_desc, q_valid)
    bows = lc.kf_bows(m)
    s_dense = np.asarray(l1_score(bow_q, bows))
    np.testing.assert_allclose(s_sparse, s_dense, atol=1e-5)
    assert abs(s_sparse[1] - 1.0) < 1e-5


def test_multi_loop_measurement_slots():
    """Each closed loop's verified Sim3 must land in ITS OWN edge slot:
    the second closure must not overwrite the first loop's measurement
    (round-2 verdict Weak #2)."""
    from active_orb_slam2_tpu.geometry.se3 import (
        sim3_compose, sim3_from_se3, sim3_inverse)
    K = 8
    lc = LoopCloser(CFG)
    rng = np.random.default_rng(5)
    # random valid poses so tree/covis measurements are non-trivial
    tw = rng.normal(0, 0.3, (K, 6)).astype(np.float32)
    poses = jnp.stack([se3_exp(jnp.asarray(t)) for t in tw])
    pre_sim3 = sim3_from_se3(poses)
    kf_valid = jnp.ones((K,), bool)
    kf_parent = jnp.asarray(
        np.concatenate([[-1], np.arange(K - 1)]).astype(np.int32))
    W = jnp.zeros((K, K), jnp.int32)

    rel1 = sim3_compose(pre_sim3[5],
                        sim3_compose(sim3_from_se3(
                            se3_exp(jnp.array([0, 0, 0, .1, 0, 0]))),
                            sim3_inverse(pre_sim3[0])))
    lc.loop_edges.append((0, 5))
    e1 = lc._essential_edges(pre_sim3, kf_valid, kf_parent, W, rel1)
    E0 = e1.meas_ji.shape[0] - 32
    np.testing.assert_allclose(np.asarray(e1.meas_ji[E0]),
                               np.asarray(rel1), atol=1e-6)

    rel2 = sim3_compose(pre_sim3[7],
                        sim3_compose(sim3_from_se3(
                            se3_exp(jnp.array([0, 0, 0, 0, .2, 0]))),
                            sim3_inverse(pre_sim3[1])))
    lc.loop_edges.append((1, 7))
    e2 = lc._essential_edges(pre_sim3, kf_valid, kf_parent, W, rel2)
    # slot 0 keeps loop 1 (recomputed from poses, which encode the
    # verified Sim3 post-correction); slot 1 carries the NEW verified
    # measurement — not slot 0
    np.testing.assert_allclose(np.asarray(e2.meas_ji[E0 + 1]),
                               np.asarray(rel2), atol=1e-6)
    # loop-1 slot must NOT contain rel2
    assert not np.allclose(np.asarray(e2.meas_ji[E0]),
                           np.asarray(rel2), atol=1e-4)
    assert bool(e2.valid[E0]) and bool(e2.valid[E0 + 1])
    assert int(e2.i[E0]) == 0 and int(e2.j[E0]) == 5
    assert int(e2.i[E0 + 1]) == 1 and int(e2.j[E0 + 1]) == 7
