"""Localization-only mode with temporal points.

``Tracking::UpdateLastFrame`` (src/Tracking.cc ~L780 [U]) synthesizes
short-lived depth points in localization-only mode so tracking survives
away from mapped regions (the mbVO visual-odometry state).  Round-3
verdict Missing 4: activate_localization_mode only stopped KF insertion
— nothing replaced the temporal points, so leaving the mapped region
meant LOST.

Differential test: drive a circle; map only the first arc; traverse the
unmapped remainder (a) in localization mode (temporal points ON) and
(b) with mapping merely frozen (temporal points OFF).  (a) must stay OK
through frames where (b) is LOST.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (run with -m slow)

import numpy as np

from active_orb_slam2_tpu.config import (
    MapConfig, OrbConfig, SlamConfig, TrackingConfig)
from active_orb_slam2_tpu.geometry import CameraParams
from active_orb_slam2_tpu.io.synthetic import (
    default_world, loop_trajectory, make_sequence)
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

N = 72          # 5 deg/frame around the circle (9+ deg loses tracking)
N_MAPPED = 18


def _run(localization_mode: bool):
    frames = list(make_sequence(
        N, CAM, world=default_world(),
        trajectory=loop_trajectory(N, radius=1.2)))
    slam = System(CFG, pipeline_depth=0, retire_batch=1)
    for i in range(N_MAPPED):
        g, d, _ = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
    slam.flush()
    assert slam.state == OK
    if localization_mode:
        slam.activate_localization_mode()
    else:
        # control: freeze KF insertion WITHOUT temporal points — the
        # round-3 behavior of activate_localization_mode
        slam.use_mapping = False
    states = []
    for i in range(N_MAPPED, N):
        g, d, _ = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
        slam.flush()
        states.append(slam._state)
        if slam._state == LOST:
            break                      # stop at first loss (no reloc)
    return states


def test_temporal_points_survive_unmapped_region():
    states_on = _run(True)
    states_off = _run(False)
    ok_on = sum(s == OK for s in states_on)
    ok_off = sum(s == OK for s in states_off)
    # temporal points must carry tracking well past where the frozen-map
    # control loses it
    assert LOST in states_off, "control unexpectedly survived; test is vacuous"
    assert ok_on > ok_off + 5, (ok_on, ok_off)
    assert LOST not in states_on, f"localization mode lost at {ok_on}"
