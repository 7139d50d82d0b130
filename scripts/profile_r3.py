"""Round-3 regression hunt: where do the 43.8 ms/frame of the driver
bench actually go?

Measures, on the real chip, with the exact bench.py configuration:
  1. steady-state pipelined throughput (the driver's number),
  2. synchronous per-frame latency of the fused frame-build+track step,
  3. frame build (ORB extraction path) alone,
  4. track step alone,
  5. host-side overhead of one dispatch (enqueue time, no wait).
"""
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def lap(msg):
    print(msg, file=sys.stderr, flush=True)


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
    lap("frames ready")

    slam = System(cfg, use_mapping=False)
    for i in range(6):
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
    slam.flush()
    lap("warm")

    # 1. pipelined throughput (driver's measurement)
    t0 = time.perf_counter()
    n = 0
    for i in range(6, n_frames):
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
        n += 1
    slam.flush()
    dt = time.perf_counter() - t0
    print(f"pipelined e2e          {dt/n*1e3:8.2f} ms/frame "
          f"({n/dt:.1f} fps)")

    # 2. synchronous fused-step latency
    fused = slam._fused_step("rgbd")
    m, st = slam.map, slam.track
    def _pack(g, d):
        pk = np.empty((3,) + g.shape, np.uint8)
        pk[0] = g
        pk[1] = (d & 0xFF).astype(np.uint8)
        pk[2] = (d >> 8).astype(np.uint8)
        return pk
    packed = _pack(frames[10][0], frames[10][1])
    packed_dev = jnp.asarray(packed)
    out = fused(packed_dev, m, st)
    jax.block_until_ready(out)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fused(packed_dev, m, st)
        jax.block_until_ready(out)
    print(f"fused step (sync)      "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

    # 2b. fused step, chained without host sync (device-only time): feed
    # st back in so the chain serializes on the device
    t0 = time.perf_counter()
    st2 = st
    outs = []
    for _ in range(reps):
        frame, st2, stats, m2 = fused(packed_dev, m, st2)
        outs.append(stats)
    jax.block_until_ready(outs)
    print(f"fused step (chained)   "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

    # 3. frame build alone
    make = slam.make_rgbd.packed
    out = make(packed_dev)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = make(packed_dev)
        jax.block_until_ready(out)
    print(f"frame build (sync)     "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

    frame, _ = out

    # 4. track step alone
    out2 = slam.track_step(m, frame, st)
    jax.block_until_ready(out2)
    t0 = time.perf_counter()
    for _ in range(reps):
        out2 = slam.track_step(m, frame, st)
        jax.block_until_ready(out2)
    print(f"track step (sync)      "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

    # 5. host dispatch overhead (enqueue only)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fused(packed_dev, m, st)
    t1 = time.perf_counter()
    jax.block_until_ready(out)
    print(f"host enqueue           {(t1-t0)/reps*1e3:8.2f} ms")

    # 6. extractor alone (level image path inside frame build)
    from active_orb_slam2_tpu.ops.orb import build_extractor
    ext = build_extractor(cfg.orb, 480, 640)
    img = jnp.asarray(frames[10][0].astype(np.float32))
    out3 = ext(img)
    jax.block_until_ready(out3)
    t0 = time.perf_counter()
    for _ in range(reps):
        out3 = ext(img)
        jax.block_until_ready(out3)
    print(f"orb extractor (sync)   "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
