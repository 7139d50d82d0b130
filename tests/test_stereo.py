"""Stereo matching + stereo pipeline tests on rendered pairs."""

import numpy as np
import jax.numpy as jnp
import pytest

from active_orb_slam2_tpu.config import (
    MapConfig, OrbConfig, SlamConfig, TrackingConfig)
from active_orb_slam2_tpu.geometry import CameraParams, umeyama_alignment
from active_orb_slam2_tpu.io.synthetic import (
    default_world, orbit_trajectory, render_rgbd)
from active_orb_slam2_tpu.io.trajectory import camera_centers
from active_orb_slam2_tpu.models.system import OK, System

BASELINE = 0.12
CAM = CameraParams(fx=260.0, fy=260.0, cx=159.5, cy=119.5,
                   bf=260.0 * BASELINE, width=320, height=240)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=512, n_levels=4),
    tracking=TrackingConfig(th_depth=12.0),
    map=MapConfig(max_keyframes=32, max_points=8192,
                  local_ba_keyframes=8, local_ba_points=2048),
    sensor="stereo")


def render_pair(world, Twc):
    right_offset = np.eye(4, dtype=np.float32)
    right_offset[0, 3] = BASELINE
    gl, dl = render_rgbd(world, CAM, Twc)
    gr, _ = render_rgbd(world, CAM, Twc @ right_offset)
    return gl, gr, dl


@pytest.mark.slow
def test_stereo_depth_accuracy():
    from active_orb_slam2_tpu.config import OrbConfig
    from active_orb_slam2_tpu.models.frame import build_stereo_pipeline
    world = default_world()
    Twc = orbit_trajectory(3)[0]
    gl, gr, dl = render_pair(world, Twc)
    make = build_stereo_pipeline(CFG)
    frame, n_depth = make(gl.astype(np.uint8), gr.astype(np.uint8))
    n = int(n_depth)
    assert n > 150, n
    # compare recovered depth against the rendered ground-truth depth
    uv = np.asarray(frame.uv)
    dep = np.asarray(frame.depth)
    ok = np.asarray(frame.valid) & (dep > 0)
    xi = np.clip(np.round(uv[ok, 0]).astype(int), 0, 319)
    yi = np.clip(np.round(uv[ok, 1]).astype(int), 0, 239)
    gt = dl[yi, xi]
    rel = np.abs(dep[ok] - gt) / gt
    assert np.median(rel) < 0.05, np.median(rel)


@pytest.mark.slow
def test_stereo_pipeline_tracks():
    world = default_world()
    traj = orbit_trajectory(20, step_deg=2.0)
    slam = System(CFG)
    gt = []
    for i, Twc in enumerate(traj):
        gl, gr, _ = render_pair(world, Twc)
        slam.track_stereo(gl, gr, i / 30.0)
        gt.append(Twc[:3, 3])
    assert slam.state == OK
    assert int(slam.track.n_inliers) > 50
    ts, poses = slam.frame_trajectory()
    est = camera_centers(poses)
    _, _, _, _, rmse = umeyama_alignment(
        jnp.array(est), jnp.array(np.stack(gt)), fix_scale=True)
    assert float(rmse) < 0.06, float(rmse)
