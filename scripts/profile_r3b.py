"""Round-3 regression hunt, part 2: which host<->device interaction
costs the ~50 ms/frame in the pipelined loop when chained device
compute is only ~5 ms/frame?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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

    n_frames = 24
    frames = [(np.clip(g, 0, 255).astype(np.uint8),
               np.clip(d * 1e3, 0, 65535).astype(np.uint16))
              for g, d, _ in make_sequence(
                  n_frames, cam, world=default_world(),
                  trajectory=orbit_trajectory(n_frames, step_deg=0.8))]
    print("frames ready", file=sys.stderr, flush=True)

    slam = System(cfg, use_mapping=False)
    for i in range(6):
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
    slam.flush()
    fused = slam._fused_step("rgbd")
    m, st0 = slam.map, slam.track
    def _pack(g, d):
        pk = np.empty((3,) + g.shape, np.uint8)
        pk[0] = g
        pk[1] = (d & 0xFF).astype(np.uint8)
        pk[2] = (d >> 8).astype(np.uint8)
        return pk
    packed_list = [_pack(g, d) for g, d in frames[6:]]
    reps = len(packed_list)

    # A. chained dispatch with FRESH HOST numpy input each step
    st = st0
    outs = []
    t0 = time.perf_counter()
    for p in packed_list:
        frame, st, stats, m2 = fused(p, m, st)
        outs.append(stats)
    jax.block_until_ready(outs)
    print(f"A chained, host input      "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms/frame")

    # B. H2D transfer alone (async dispatch, block at end)
    t0 = time.perf_counter()
    devs = [jnp.asarray(p) for p in packed_list]
    jax.block_until_ready(devs)
    print(f"B H2D 1.2MB transfer       "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms/frame")

    # C. chained + copy_to_host_async on stats each step (no polling)
    st = st0
    outs = []
    t0 = time.perf_counter()
    for p in packed_list:
        frame, st, stats, m2 = fused(p, m, st)
        stats.copy_to_host_async()
        outs.append(stats)
    jax.block_until_ready(outs)
    print(f"C + copy_to_host_async     "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms/frame")

    # D. chained + eager is_ready polling of 4-deep window (the
    # System's retirement behavior, minus the host state machine)
    st = st0
    pend = []
    t0 = time.perf_counter()
    for p in packed_list:
        frame, st, stats, m2 = fused(p, m, st)
        stats.copy_to_host_async()
        pend.append(stats)
        while len(pend) > 4:
            while not pend[0].is_ready():
                time.sleep(0.0002)
            np.asarray(pend[0])
            pend.pop(0)
    for s in pend:
        np.asarray(s)
    print(f"D + 4-deep retire loop     "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms/frame")

    # E. the actual System loop (same as bench)
    t0 = time.perf_counter()
    for i in range(6, n_frames):
        g, d = frames[i]
        slam.track_rgbd(g, d, i / 30.0)
    slam.flush()
    print(f"E System.track_rgbd loop   "
          f"{(time.perf_counter()-t0)/(n_frames-6)*1e3:8.2f} ms/frame")

    # F. is_ready cost on a fresh in-flight computation
    frame, st2, stats, m2 = fused(packed_list[0], m, st0)
    t0 = time.perf_counter()
    k = 0
    while not stats.is_ready():
        k += 1
        if k > 100000:
            break
    dt = time.perf_counter() - t0
    print(f"F is_ready spin to done    {dt*1e3:8.2f} ms ({k} polls)")

    # G. se3_to_mat44 per-frame dispatch cost (System returns this)
    from active_orb_slam2_tpu.geometry.se3 import se3_to_mat44
    t0 = time.perf_counter()
    for _ in range(reps):
        out = se3_to_mat44(jnp.asarray(st0.pose))
    jax.block_until_ready(out)
    print(f"G se3_to_mat44 dispatches  "
          f"{(time.perf_counter()-t0)/reps*1e3:8.2f} ms/frame")


if __name__ == "__main__":
    main()
