"""Separate tunnel H2D bandwidth from device compute in the frame path.

Questions this answers (run on the real chip):
  1. H2D bandwidth vs transfer size (does batching transfers help?)
  2. device-only time of the fused frame-build+track step (enqueue N on
     device-resident input, sync once)
  3. pipelined H2D + fused step throughput (what bench.py measures)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/aos2_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from active_orb_slam2_tpu.config import (
        MapConfig, OrbConfig, SlamConfig, TrackingConfig)
    from active_orb_slam2_tpu.geometry import CameraParams
    from active_orb_slam2_tpu.io.synthetic import (
        default_world, make_sequence, orbit_trajectory)
    from active_orb_slam2_tpu.models.system import System

    # --- H2D bandwidth vs size ----------------------------------------
    for mb in (0.3, 0.9, 1.2, 2.4, 4.8, 9.6):
        n = int(mb * 1e6)
        buf = np.zeros(n, np.uint8)
        jax.device_put(buf).block_until_ready()
        t0 = time.perf_counter()
        reps = 8
        for _ in range(reps):
            jax.device_put(buf).block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"H2D {mb:5.1f} MB: {dt*1e3:7.2f} ms  "
              f"({n/dt/1e6:6.1f} MB/s)")

    # --- overlapping H2D (no sync between puts) ------------------------
    buf = np.zeros(int(1.2e6), np.uint8)
    t0 = time.perf_counter()
    outs = [jax.device_put(buf) for _ in range(16)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 16
    print(f"H2D 1.2 MB x16 pipelined: {dt*1e3:7.2f} ms/transfer "
          f"({1.2e6/dt/1e6:6.1f} MB/s)")

    cam = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                       width=640, height=480)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=1024, n_levels=8),
        tracking=TrackingConfig(th_depth=8.0),
        map=MapConfig(max_keyframes=64, max_points=16384,
                      local_ba_keyframes=8, local_ba_points=2048))
    n_frames = 10
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

    # --- device-only fused step ----------------------------------------
    g, d = frames[6]
    packed = jax.device_put(np.stack([g.astype(np.uint16), d]))
    packed.block_until_ready()
    fused = slam._fused_step("rgbd")
    m, st = slam.map, slam.track
    _, st2, stats, m2 = fused(packed, m, st)
    jax.block_until_ready((st2, stats, m2))
    t0 = time.perf_counter()
    reps = 20
    outs = []
    for _ in range(reps):
        frame, st, stats, m = fused(packed, m, st)
        outs.append(stats)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"fused step, device-resident input, x{reps} chained: "
          f"{dt*1e3:7.2f} ms/step")

    # --- pipelined H2D + fused step -------------------------------------
    m, st = slam.map, slam.track
    t0 = time.perf_counter()
    outs = []
    for i in range(reps):
        g, d = frames[6 + i % 4]
        packed = np.stack([g.astype(np.uint16), d])
        frame, st, stats, m = fused(jax.device_put(packed), m, st)
        outs.append(stats)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"H2D + fused step pipelined x{reps}: {dt*1e3:7.2f} ms/frame")

    # --- same but narrower transfer (uint8 gray + uint16 mm depth as
    #     3 uint8 planes = 0.9 MB instead of 1.2 MB) ---------------------
    def pack3(g, d):
        return np.stack([g, (d & 0xFF).astype(np.uint8),
                         (d >> 8).astype(np.uint8)])
    unpack = jax.jit(lambda p: (p[0].astype(jnp.uint16),
                                (p[1].astype(jnp.uint16)
                                 | (p[2].astype(jnp.uint16) << 8))))
    p3 = pack3(*frames[6])
    unpack(jax.device_put(p3))[0].block_until_ready()
    t0 = time.perf_counter()
    outs = [unpack(jax.device_put(pack3(*frames[6 + i % 4])))[0]
            for i in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"H2D 0.9 MB pack3 + unpack x{reps} pipelined: "
          f"{dt*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
