"""Profile the per-frame tracking path stage by stage on the real chip.

Separates: H2D transfer, ORB frame build, track step, and bare
dispatch/round-trip latency — to decide where optimization effort goes.
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

    cam = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                       width=640, height=480)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=1024, n_levels=8),
        tracking=TrackingConfig(th_depth=8.0),
        map=MapConfig(max_keyframes=64, max_points=16384,
                      local_ba_keyframes=8, local_ba_points=2048))

    n_frames = 12
    frames = [(np.clip(g, 0, 255).astype(np.uint8),
               np.clip(d * 1e3, 0, 65535).astype(np.uint16))
              for g, d, _ in make_sequence(
                  n_frames, cam, world=default_world(),
                  trajectory=orbit_trajectory(n_frames, step_deg=0.8))]

    slam = System(cfg, use_mapping=False)
    for i in range(6):
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)

    # --- bare round-trip latency -------------------------------------
    small = jnp.zeros((8,), jnp.float32)
    f_id = jax.jit(lambda x: x + 1)
    f_id(small).block_until_ready()
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        np.asarray(f_id(small))
    print(f"dispatch+sync roundtrip: "
          f"{(time.perf_counter()-t0)/reps*1e3:.2f} ms")

    # --- H2D transfer of packed frame ---------------------------------
    g, d = frames[6]
    packed = np.stack([g.astype(np.uint16), d])
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_put(packed).block_until_ready()
    print(f"H2D packed frame:        "
          f"{(time.perf_counter()-t0)/reps*1e3:.2f} ms")

    # --- frame build (ORB extraction) ----------------------------------
    dev = jax.device_put(packed)
    out = slam.make_rgbd.packed(dev)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(slam.make_rgbd.packed(dev))
    print(f"frame build (device):    "
          f"{(time.perf_counter()-t0)/reps*1e3:.2f} ms")

    frame, _n = slam.make_rgbd.packed(dev)
    jax.block_until_ready(frame)

    # --- track step -----------------------------------------------------
    out = slam.track_step(slam.map, frame, slam.track)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(slam.track_step(slam.map, frame, slam.track))
    print(f"track step (device):     "
          f"{(time.perf_counter()-t0)/reps*1e3:.2f} ms")

    # --- full per-frame path as in bench --------------------------------
    t0 = time.perf_counter()
    n = 0
    for i in range(6, n_frames):
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
        n += 1
    print(f"full track_rgbd:         "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms")


if __name__ == "__main__":
    main()
