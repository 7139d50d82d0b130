"""Device-side stage breakdown: extraction vs tracking vs sub-stages.

All inputs device-resident; each stage chained x reps with one sync, so
numbers are true device times (tunnel RTT amortized away).
"""
import time

import numpy as np


def timed(label, fn, *args, reps=20, chain=None):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for _ in range(reps):
        outs.append(fn(*args))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return out


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
    from active_orb_slam2_tpu.ops.orb import build_extractor
    from active_orb_slam2_tpu.ops import fast, image as img_ops

    cam = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                       width=640, height=480)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=1024, n_levels=8),
        tracking=TrackingConfig(th_depth=8.0),
        map=MapConfig(max_keyframes=64, max_points=16384,
                      local_ba_keyframes=8, local_ba_points=2048))
    n_frames = 8
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

    g, d = frames[6]
    packed = jax.device_put(np.stack([g.astype(np.uint16), d]))
    packed.block_until_ready()

    # full fused step
    fused = slam._fused_step("rgbd")
    m, st = slam.map, slam.track
    timed("fused frame-build + track", fused, packed, m, st)

    # frame build alone
    timed("frame build (make_rgbd.packed)", slam.make_rgbd.packed, packed)
    frame, _ = slam.make_rgbd.packed(packed)
    jax.block_until_ready(frame)

    # track step alone
    timed("track step", slam.track_step, m, frame, st)

    # extractor alone
    ext = build_extractor(cfg.orb, 480, 640)
    gray_f = jnp.asarray(g, jnp.float32)
    gray_f.block_until_ready()
    timed("ORB extractor (8 levels)", ext, gray_f)

    # extractor sub-stages on level 0 image
    fast_j = jax.jit(lambda x: fast.nms3x3(fast.fast_score_map(x)))
    timed("FAST score+nms, level0 640x480", fast_j, gray_f)
    blur_j = jax.jit(lambda x: img_ops.gaussian_blur(x))
    timed("gaussian blur, level0", blur_j, gray_f)
    rs_j = jax.jit(lambda x: img_ops.resize_bilinear(x, 400, 533))
    timed("resize 640->533", rs_j, gray_f)

    from active_orb_slam2_tpu.ops.orb import (
        _detect_level, _threshold_fallback, _keypoint_stage)
    score = fast_j(gray_f)
    det_j = jax.jit(lambda s: _detect_level(
        _threshold_fallback(s, cfg.orb), 245, cfg.orb))
    timed("detect_level (cells top-k)", det_j, score)
    ys, xs, resp = det_j(score)
    padded = jax.jit(lambda x: img_ops.pad_image(x, cfg.orb.pad))(gray_f)
    jax.block_until_ready((ys, padded))
    kp_j = jax.jit(lambda p, y, x: _keypoint_stage(p, y, x, cfg.orb.pad))
    timed("keypoint stage: patches+IC+blur+BRIEF", kp_j, padded, ys, xs)


if __name__ == "__main__":
    main()
