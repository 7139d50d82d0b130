"""Instrument bench.py's exact loop: where do the ms per frame go?"""
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/aos2_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    n_frames = 38
    frames = [(np.clip(g, 0, 255).astype(np.uint8),
               np.clip(d * 1e3, 0, 65535).astype(np.uint16))
              for g, d, _ in make_sequence(
                  n_frames, cam, world=default_world(),
                  trajectory=orbit_trajectory(n_frames, step_deg=0.8))]

    slam = System(cfg, use_mapping=False)
    for i in range(6):
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
    slam.flush()

    # wrap _retire and _stack_stats with timers
    t_retire = [0.0]
    orig_retire = slam._retire

    def timed_retire(n):
        t0 = time.perf_counter()
        orig_retire(n)
        t_retire[0] += time.perf_counter() - t0
    slam._retire = timed_retire

    per_call = []
    t0 = time.perf_counter()
    for i in range(6, n_frames):
        g, d = frames[i]
        tc = time.perf_counter()
        slam.track_rgbd(g, d, i / 30.0)
        per_call.append(time.perf_counter() - tc)
    tf = time.perf_counter()
    slam.flush()
    t_total = time.perf_counter() - t0
    n = len(per_call)
    print(f"total: {t_total/n*1e3:7.2f} ms/frame "
          f"(flush tail {(time.perf_counter()-tf)*1e3:.1f} ms)")
    print(f"track_rgbd host time: {sum(per_call)/n*1e3:7.2f} ms/frame")
    print(f"  of which _retire:   {t_retire[0]/n*1e3:7.2f} ms/frame")
    srt = sorted(per_call)
    print(f"  per-call p50/p90/max: {srt[n//2]*1e3:.1f} / "
          f"{srt[int(n*0.9)]*1e3:.1f} / {srt[-1]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
