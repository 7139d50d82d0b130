"""Mid-scale endurance tripwire (r4 verdict item 7): the gap between
the 48-frame e2e fixtures and the 4,000-frame chip endurance run was
unmeasured — scale divergence (bad closures, cull/recycle corruption)
was only caught by chip runs.  This test drives 500 frames (2 laps of
a 250-pose circle) through the FULL pipeline on CPU with loop closing
and culling live, and bounds the similarity-aligned ATE.

Runtime: ~10-15 min on 2 CPU cores — marked slow like the other e2e
modules (`pytest -m "not slow"` skips it in the fast suite).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from active_orb_slam2_tpu.config import (
    MapConfig, OrbConfig, SlamConfig, TrackingConfig)
from active_orb_slam2_tpu.geometry import CameraParams
from active_orb_slam2_tpu.io.synthetic import (
    default_world, loop_trajectory, render_rgbd)
from active_orb_slam2_tpu.io.trajectory import camera_centers
from active_orb_slam2_tpu.models.system import OK, System

CAM = CameraParams(fx=260.0, fy=260.0, cx=159.5, cy=119.5, bf=20.8,
                   width=320, height=240)


def _ate(est, gt):
    mu_e, mu_g = est.mean(0), gt.mean(0)
    ec, gc = est - mu_e, gt - mu_g
    U, D, Vt = np.linalg.svd(gc.T @ ec / len(est))
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    s = np.trace(np.diag(D) @ S) / max((ec ** 2).sum() / len(est), 1e-12)
    t = mu_g - s * R @ mu_e
    return float(np.sqrt((((s * est @ R.T + t) - gt) ** 2)
                         .sum(1).mean()))


def test_midscale_endurance_two_laps():
    unique, frames = 250, 500
    world = default_world(n_boxes=8)
    traj = loop_trajectory(unique, radius=1.2)
    cache = []
    for Twc in traj:
        g, d = render_rgbd(world, CAM, Twc)
        cache.append((np.clip(g, 0, 255).astype(np.uint8),
                      np.clip(d * 1e3, 0, 65535).astype(np.uint16),
                      Twc[:3, 3].copy()))
    cfg = SlamConfig(
        camera=CAM,
        orb=OrbConfig(n_features=1024, n_levels=8),
        tracking=TrackingConfig(th_depth=8.0, kf_max_interval=8),
        map=MapConfig(max_keyframes=128, max_points=16384,
                      local_ba_keyframes=8, local_ba_points=2048))
    slam = System(cfg, use_mapping=True, use_loop_closing=True)
    gt = []
    for i in range(frames):
        g, d, c = cache[i % unique]
        slam.track_rgbd(g, d, i / 30.0)
        gt.append(c)
    slam.flush()
    assert slam._state == OK
    # the circuit genuinely revisits lap-1 territory; the pipeline must
    # close at least one loop without corrupting the map
    _, poses = slam.frame_trajectory()
    est = np.asarray(camera_centers(poses))
    ate = _ate(est, np.stack(gt))
    lc = slam.loop_closer
    assert ate < 0.25, (
        f"mid-scale ATE {ate:.3f} m (loops={slam.n_loops_closed} "
        f"rejected={lc.n_rejected} kf={slam.kf_seq})")
    # a healthy run recycles keyframe slots without losing tracking
    assert slam.kf_seq > 20
