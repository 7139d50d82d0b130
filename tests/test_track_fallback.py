"""TrackReferenceKeyFrame fallback: motion-stage collapse must recover
through the wide local-map search WITHOUT relocalization.

Reference ``Tracking::Track`` (src/Tracking.cc ~L730-770 [U]): when
``TrackWithMotionModel`` fails, ``TrackReferenceKeyFrame`` re-matches
against the reference keyframe from the last frame's pose.  Our fused
step's analog votes local keyframes from the PREVIOUS frame's
associations when the motion stage collapses — this test injects a
velocity kick big enough to break motion-model matching and asserts
the next frames stay OK (no LOST, no reloc flush).
"""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (run with -m slow)

import numpy as np
import jax.numpy as jnp

from active_orb_slam2_tpu.config import (
    MapConfig, OrbConfig, SlamConfig, TrackingConfig)
from active_orb_slam2_tpu.geometry import CameraParams
from active_orb_slam2_tpu.io.synthetic import (
    default_world, make_sequence, orbit_trajectory)
from active_orb_slam2_tpu.models.system import LOST, OK, System

CAM = CameraParams(fx=260.0, fy=260.0, cx=159.5, cy=119.5, bf=20.8,
                   width=320, height=240)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=512, n_levels=4),
    tracking=TrackingConfig(th_depth=8.0),
    map=MapConfig(max_keyframes=32, max_points=8192,
                  local_ba_keyframes=8, local_ba_points=2048),
)


def test_motion_collapse_recovers_without_reloc():
    n = 16
    frames = list(make_sequence(
        n, CAM, world=default_world(),
        trajectory=orbit_trajectory(n, step_deg=2.0)))
    slam = System(CFG, pipeline_depth=0, retire_batch=1)
    for i in range(10):
        g, d, _ = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
    slam.flush()
    assert slam.state == OK

    # velocity kick: a large bogus translation makes the constant-
    # velocity prediction project last frame's points far off their
    # true pixels -> motion-stage matching collapses (res1 inliers ~0)
    kick = jnp.array([1.0, 0.0, 0.0, 0.0, 0.8, -0.6, 0.5], jnp.float32)
    slam.track = slam.track._replace(velocity=kick,
                                     vel_ok=jnp.array(True))
    states = []
    for i in range(10, n):
        g, d, _ = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
        slam.flush()
        states.append(slam._state)
    assert LOST not in states, f"fallback failed: states={states}"
    assert slam.state == OK
    # recovery happened through tracking, not relocalization
    assert slam.relocalizer is None
    # and the recovered pose is sane: motion resumed with inliers
    m = [r for r in slam.metrics if r["frame"] >= 10]
    assert m[-1]["n_inliers"] > 50
