"""Benchmark: RGB-D tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md [U]): the reference tracks a VGA frame with 1000
features in ~25-30 ms on an i7 (4 threads) — we take 30 ms/frame
(33.3 fps) as the comparison point.  vs_baseline > 1 means faster than
the reference.

Parity semantics: the reference's number is TRACKING-THREAD time per
frame (ORB extraction + matching + two pose optimizations); its local
mapping/loop closing run on background threads and are excluded.  This
bench therefore measures the same per-frame tracking path (frame build
+ track step, including host<->device transfer of the camera frame),
on a map built by the RGB-D initializer.  Mapping-step cost is bounded
and amortized at keyframe rate in deployment (see ARCHITECTURE.md).

Compilation covers the tracking-path programs plus one mapping_step
(for the ms/KF metric); the persistent cache at /tmp/aos2_jax_cache
keeps repeat runs fast over slow remote-compile links.
"""

import json
import sys
import time

import numpy as np

_T0 = time.time()


def _lap(msg):
    print(f"[bench {time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/aos2_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

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

    n_frames = 42
    _lap("rendering frames")
    frames = [(np.clip(g, 0, 255).astype(np.uint8),
               np.clip(d * 1e3, 0, 65535).astype(np.uint16))
              for g, d, _ in make_sequence(
                  n_frames, cam, world=default_world(),
                  trajectory=orbit_trajectory(n_frames, step_deg=0.8))]
    _lap("frames ready")

    # tracking-path only (the reference's per-frame thread): mapping is
    # amortized at KF rate on a background cadence
    slam = System(cfg, use_mapping=False)
    for i in range(6):                       # compiles + map init
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
        _lap(f"warmup frame {i}")
    slam.flush()

    # three measurement windows, median wins: the tunneled link has
    # transient multi-hundred-ms hiccups that would otherwise dominate
    # a single short window
    _lap("measuring")
    window_ms = []
    idx = 6
    per_window = (n_frames - 6) // 3
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(idx, idx + per_window):
            g, d = frames[i]
            slam.track_rgbd(g, d, i / 30.0)
        slam.flush()                         # drain the device queue
        window_ms.append(
            (time.perf_counter() - t0) / per_window * 1e3)
        idx += per_window
        _lap(f"window {w}: {window_ms[-1]:.2f} ms/frame")
    ms_per_frame = float(np.median(window_ms))
    fps = 1e3 / ms_per_frame
    baseline_ms = 30.0

    # ---- mapping-side budget (round-2 verdict item 9): the reference
    # amortizes local BA at keyframe rate on a background thread with a
    # 100-400 ms/KF budget (BASELINE.md).  Measure our jitted
    # mapping_step (local BA window + point culling) at the bench map
    # size so "bounded BA slices" has a number in every BENCH record.
    import jax as _jax
    _lap("mapping-step timing")
    m, k = slam.map, max(slam.last_kf_slot, 0)
    out = slam.mapping_step(m, k, slam.kf_seq)     # compile
    _jax.block_until_ready(out)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = slam.mapping_step(m, k, slam.kf_seq)
        _jax.block_until_ready(out)
    mapping_ms = (time.perf_counter() - t0) / reps * 1e3

    print(json.dumps({
        "metric": "rgbd_tracking_throughput_vga_1024feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(baseline_ms / ms_per_frame, 3),
        "mapping_ms_per_kf": round(mapping_ms, 2),
        "mapping_budget_ok": bool(mapping_ms < 400.0),
    }))


if __name__ == "__main__":
    main()
