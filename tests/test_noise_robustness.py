"""Sensor-noise robustness of the end-to-end RGB-D pipeline.

Round-3 verdict item 6: with no real dataset reachable (zero egress),
the synthetic parity proxy must at least carry realistic sensor noise —
additive photometric noise and the Kinect quadratic axial depth-noise
model — and hold a tight ATE bound with it ON.  The noise-free e2e
bound is 0.025 m (test_e2e_rgbd); noise costs a little accuracy but
must not break the sub-centimetre-per-metre regime.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (run with -m slow)

import numpy as np
import jax.numpy as jnp

from active_orb_slam2_tpu.config import (
    MapConfig, OrbConfig, SlamConfig, TrackingConfig)
from active_orb_slam2_tpu.geometry import CameraParams, umeyama_alignment
from active_orb_slam2_tpu.io.synthetic import (
    default_world, make_sequence, orbit_trajectory)
from active_orb_slam2_tpu.io.trajectory import camera_centers
from active_orb_slam2_tpu.models.system import OK, System

CAM = CameraParams(fx=260.0, fy=260.0, cx=159.5, cy=119.5, bf=20.8,
                   width=320, height=240)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=512, n_levels=4),
    tracking=TrackingConfig(th_depth=8.0),
    map=MapConfig(max_keyframes=32, max_points=8192,
                  local_ba_keyframes=8, local_ba_points=2048),
)
N = 30


def test_noisy_rgbd_ate_bound():
    slam = System(CFG)
    gt = []
    for i, (g, d, Twc) in enumerate(make_sequence(
            N, CAM, world=default_world(),
            trajectory=orbit_trajectory(N, step_deg=2.0),
            photo_noise=3.0, depth_noise=1.0)):
        slam.track_rgbd(g, d, i / 30.0)
        gt.append(Twc[:3, 3])
    slam.flush()
    assert slam.state == OK
    _, poses = slam.frame_trajectory()
    est = camera_centers(poses)
    *_, rmse = umeyama_alignment(jnp.asarray(est),
                                 jnp.asarray(np.stack(gt)),
                                 fix_scale=True)
    ate = float(rmse)
    # noise-free measures ~0.009; Kinect-level depth noise + photo
    # noise should land well under 0.04 on this 1.3 m-scale orbit
    assert ate < 0.04, f"noisy ATE {ate:.4f} m"
