"""Benchmark: RGB-D tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md [U]): the reference tracks a VGA frame with 1000
features in ~25-30 ms on an i7 (4 threads) — we take 30 ms/frame
(33.3 fps) as the comparison point.  vs_baseline > 1 means faster than
the reference.

The measured quantity is steady-state wall time per call of the full
per-frame path (frame build: pyramid+FAST+BRIEF; tracking: two
projection matching passes + two pose optimizations), on prerendered
synthetic VGA RGB-D frames, excluding compilation.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from active_orb_slam2_tpu.config import (
        MapConfig, OrbConfig, SlamConfig, TrackingConfig)
    from active_orb_slam2_tpu.geometry import CameraParams
    from active_orb_slam2_tpu.io.synthetic import (
        default_world, make_sequence, orbit_trajectory)
    from active_orb_slam2_tpu.models.system import System

    cam = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                       width=640, height=480)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=1024, n_levels=8),
        tracking=TrackingConfig(th_depth=8.0),
        map=MapConfig(max_keyframes=64, max_points=16384,
                      local_ba_keyframes=8, local_ba_points=2048))

    n_frames = 40
    frames = list(make_sequence(
        n_frames, cam, world=default_world(),
        trajectory=orbit_trajectory(n_frames, step_deg=1.0)))

    slam = System(cfg)
    # warmup: init + a few tracked frames (compiles all steps)
    for i in range(8):
        g, d, _ = frames[i]
        slam.track_rgbd(g, d, i / 30.0)

    t0 = time.perf_counter()
    n_meas = 0
    for i in range(8, n_frames):
        g, d, _ = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
        n_meas += 1
    dt = time.perf_counter() - t0
    ms_per_frame = dt / n_meas * 1e3
    fps = 1e3 / ms_per_frame
    baseline_ms = 30.0
    print(json.dumps({
        "metric": "rgbd_tracking_throughput_vga_1024feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(baseline_ms / ms_per_frame, 3),
    }))


if __name__ == "__main__":
    main()
