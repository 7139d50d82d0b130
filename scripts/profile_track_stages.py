"""Track-step stage breakdown on device: in_frustum, candidate select,
search_by_projection, pose_optimization, and the full step."""
import time

import numpy as np


def timed(label, fn, *args, reps=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
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
    from active_orb_slam2_tpu.geometry.projection import in_frustum
    from active_orb_slam2_tpu.io.synthetic import (
        default_world, make_sequence, orbit_trajectory)
    from active_orb_slam2_tpu.models.optimizer import pose_optimization
    from active_orb_slam2_tpu.models.system import System
    from active_orb_slam2_tpu.ops.matching import search_by_projection

    cam = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                       width=640, height=480)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=1024, n_levels=8),
        tracking=TrackingConfig(th_depth=8.0),
        map=MapConfig(max_keyframes=64, max_points=16384,
                      local_ba_keyframes=8, local_ba_points=2048))
    frames = [(np.clip(g, 0, 255).astype(np.uint8),
               np.clip(d * 1e3, 0, 65535).astype(np.uint16))
              for g, d, _ in make_sequence(
                  8, cam, world=default_world(),
                  trajectory=orbit_trajectory(8, step_deg=0.8))]
    slam = System(cfg, use_mapping=False)
    for i, (g, d) in enumerate(frames):
        slam.track_rgbd(g, d, i / 30.0)
    slam.flush()
    m, st = slam.map, slam.track
    import jax.numpy as _jnp
    packed = np.stack([frames[-1][0].astype(np.uint16),
                       frames[-1][1]], axis=0)
    frame, _ = slam.make_rgbd.packed(_jnp.asarray(packed))
    jax.block_until_ready(frame)

    timed("full track step", slam.track_step, m, frame, st)

    f_frustum = jax.jit(lambda m, pose: in_frustum(
        cam, pose, m.pt_xyz, m.pt_normal, m.pt_min_dist, m.pt_max_dist))
    timed("in_frustum (16k pts)", f_frustum, m, st.pose)

    cand_mask = np.zeros(16384, bool)
    cand_mask[:3000] = True
    cand_mask = jnp.asarray(cand_mask)
    f_sort = jax.jit(lambda cm: jnp.argsort(~cm, stable=True)[:2048])
    timed("argsort candidate select (16k)", f_sort, cand_mask)
    f_topk = jax.jit(lambda cm: jax.lax.top_k(cm.astype(jnp.int32), 2048))
    timed("top_k candidate select (16k)", f_topk, cand_mask)

    C = 2048
    key = jax.random.PRNGKey(0)
    uv_p = jax.random.uniform(key, (C, 2)) * 600
    radii = jnp.full((C,), 4.0)
    lv = jnp.zeros((C,), jnp.int32)
    pdesc = jax.random.bits(key, (C, 8), jnp.uint32)
    pok = jnp.ones((C,), bool)
    f_sbp = jax.jit(lambda uv_p, pdesc: search_by_projection(
        uv_p, radii, lv, pdesc, pok, frame.uv, frame.level, frame.desc,
        frame.valid, max_dist=100.0, ratio=0.9))
    timed("search_by_projection 2048x1024", f_sbp, uv_p, pdesc)

    E = 1024
    pw = jax.random.normal(key, (E, 3)) * 2 + jnp.array([0, 0, 4.0])
    obs = jnp.concatenate([jax.random.uniform(key, (E, 2)) * 600,
                           jnp.zeros((E, 1))], axis=1)
    level = jnp.zeros((E,), jnp.int32)
    hs = jnp.zeros((E,), bool)
    ok = jnp.ones((E,), bool)
    f_po = jax.jit(lambda pose: pose_optimization(
        cam, pose, pw, obs, level, hs, ok))
    timed("pose_optimization 4x10 (1024 edges)", f_po, st.pose)


if __name__ == "__main__":
    main()
