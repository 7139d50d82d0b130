"""KITTI-00-shaped endurance run (round-3 verdict item 1): thousands of
frames through the FULL pipeline (mapping + loop closing ON) at the
DEFAULT arenas (512 KF / 65,536 points), with per-stage timing and
peak live counts recorded to a JSON artifact.

  python scripts/run_endurance.py --frames 4000 [--tpu] \
      [--out ENDURANCE_r04.json]

Shape rationale: upstream KITTI 00 is 4,541 stereo frames with large
loop closures and ~1,300 keyframes before culling (SURVEY.md §5.7,
config.py MapConfig docstring).  No real dataset is mountable in this
environment (zero egress — scripts/fetch_datasets.py), so the run
drives a closed circuit in the synthetic box world, traversed R times:
each traversal revisits mapped territory and must trigger loop
closures; keyframe culling + slot recycling must keep the live set
bounded and tracking healthy for the whole run.  Rendering cost is
amortized by caching the circuit's unique frames (the pipeline still
does full per-frame work every lap).

The artifact records: sustained fps, per-stage timing percentiles
(track wall / fused keyframe-mapping / loop detect / verify / correct),
peak live KF + point counts, keyframes recycled, loop closures, final
ATE vs ground truth, and whether mapping ever stalled.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def pct(xs, q):
    import numpy as np
    a = np.asarray(xs)
    return round(float(np.percentile(a, q)), 3) if a.size else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4000)
    ap.add_argument("--unique", type=int, default=1000,
                    help="unique poses on the circuit (render cache)")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--out", default="ENDURANCE_r04.json")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--trajectory", choices=("circle", "tour"),
                    default="tour",
                    help="circle: maximal redundancy (stresses culling/"
                    "recycling); tour: room-covering Lissajous "
                    "(stresses arena growth toward the 512-KF cap)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/aos2_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)

    import numpy as np
    import jax.numpy as jnp
    from active_orb_slam2_tpu.config import (
        MapConfig, OrbConfig, SlamConfig, TrackingConfig)
    from active_orb_slam2_tpu.geometry import CameraParams
    from active_orb_slam2_tpu.geometry.horn import umeyama_alignment
    from active_orb_slam2_tpu.io.synthetic import (
        default_world, loop_trajectory, render_rgbd, tour_trajectory)
    from active_orb_slam2_tpu.io.trajectory import camera_centers
    from active_orb_slam2_tpu.models.system import LOST, OK, System

    w, h = args.width, args.height
    f = 260.0 * w / 320.0
    cam = CameraParams(fx=f, fy=f, cx=(w - 1) / 2.0, cy=(h - 1) / 2.0,
                       bf=f * 0.08, width=w, height=h)
    # DEFAULT arena (MapConfig()): 512 KF / 65,536 points — the
    # deployment shape the verdict asks to prove (config #3/#4)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=1024, n_levels=8),
        tracking=TrackingConfig(th_depth=8.0, kf_max_interval=8),
        map=MapConfig())
    assert cfg.map.max_keyframes == 512 and cfg.map.max_points == 65536

    t0 = time.time()
    # the tour sweeps most of the room: no interior boxes, or the
    # camera clips into geometry (same reason the full-pipeline test
    # uses the walled world for its radius-2.5 loop)
    world = default_world(n_boxes=0 if args.trajectory == "tour" else 8)
    traj = (loop_trajectory(args.unique, radius=1.2)
            if args.trajectory == "circle"
            else tour_trajectory(args.unique))
    print(f"[{time.time()-t0:6.1f}s] rendering {args.unique} unique "
          f"poses at {w}x{h}", file=sys.stderr, flush=True)
    cache = []
    for i, Twc in enumerate(traj):
        g, d = render_rgbd(world, cam, Twc)
        cache.append((np.clip(g, 0, 255).astype(np.uint8),
                      np.clip(d * 1e3, 0, 65535).astype(np.uint16),
                      Twc[:3, 3].copy()))
        if i % 200 == 199:
            print(f"[{time.time()-t0:6.1f}s]   {i+1}/{args.unique}",
                  file=sys.stderr, flush=True)
    print(f"[{time.time()-t0:6.1f}s] frames ready", file=sys.stderr,
          flush=True)

    slam = System(cfg, use_mapping=True, use_loop_closing=True)
    slam.profile_stages = True
    stage_hist = {"mapping": [], "loop_detect": [], "loop_verify": [],
                  "loop_correct": []}
    gt = []
    lost_frames = 0
    peak_live_kf = 0
    peak_live_pt = 0
    stall_warnings = 0
    n = args.frames
    t_run = time.perf_counter()
    for i in range(n):
        g, d, c = cache[i % args.unique]
        slam.track_rgbd(g, d, i / 30.0)
        gt.append(c)
        if slam.stage_ms:
            for k, v in slam.stage_ms.items():
                stage_hist[k].append(v)
            slam.stage_ms = {}
        if i % 250 == 249:
            slam.flush()
            live_kf = slam.n_live_kf
            live_pt = int(np.asarray(slam.map.pt_valid.sum()))
            peak_live_kf = max(peak_live_kf, live_kf)
            peak_live_pt = max(peak_live_pt, live_pt)
            lost_frames += int(slam._state != OK)
            print(f"[{time.time()-t0:6.1f}s] [{i+1}/{n}] "
                  f"kf_seq={slam.kf_seq} live_kf={live_kf} "
                  f"pts={live_pt} loops={slam.n_loops_closed} "
                  f"state={slam._state}", file=sys.stderr, flush=True)
    slam.flush()
    wall = time.perf_counter() - t_run
    peak_live_kf = max(peak_live_kf, slam.n_live_kf)
    peak_live_pt = max(peak_live_pt,
                       int(np.asarray(slam.map.pt_valid.sum())))

    _, poses = slam.frame_trajectory()
    est = camera_centers(poses)
    gt_np = np.stack(gt)
    aligned, *_, rmse = umeyama_alignment(jnp.asarray(est),
                                          jnp.asarray(gt_np),
                                          fix_scale=True)
    ate = float(rmse)
    frame_err = np.linalg.norm(np.asarray(aligned) - gt_np, axis=1)
    # keyframe-trajectory ATE separates MAP quality from per-frame
    # REPLAY quality (replay bugs dominated the early r4 runs)
    kf_ts, kf_poses = slam.keyframe_trajectory()
    kf_ate = None
    if len(kf_ts) > 3:
        kf_est = camera_centers(kf_poses)
        kf_gt = np.stack([cache[int(round(t * 30)) % args.unique][2]
                          for t in kf_ts])
        *_, kf_rmse = umeyama_alignment(jnp.asarray(kf_est),
                                        jnp.asarray(kf_gt),
                                        fix_scale=True)
        kf_ate = round(float(kf_rmse), 4)
    n_degraded = sum(1 for (_, r, _) in slam.rel_records if r < 0)
    live_final = int(np.asarray(slam.map.kf_valid.sum()))

    per_frame_wall = [m["wall_ms"] for m in slam.metrics
                      if m.get("wall_ms") is not None]
    record = {
        "metric": "endurance_full_pipeline_default_arena",
        "frames": n,
        "trajectory": args.trajectory,
        "unique_poses": args.unique,
        "image": [w, h],
        "arena": [cfg.map.max_keyframes, cfg.map.max_points],
        "backend": "tpu" if args.tpu else "cpu8",
        "fps_sustained": round(n / wall, 2),
        "wall_s": round(wall, 1),
        "kf_inserted_total": slam.kf_seq,
        "kf_live_final": live_final,
        "kf_recycled": slam.kf_seq - live_final,
        "peak_live_kf": peak_live_kf,
        "peak_live_points": peak_live_pt,
        "loops_closed": slam.n_loops_closed,
        "ate_rmse_m": round(ate, 4),
        "kf_ate_rmse_m": kf_ate,
        "frame_err_p50": pct(frame_err, 50),
        "frame_err_p95": pct(frame_err, 95),
        "frame_err_max": round(float(frame_err.max()), 3),
        "degraded_records": n_degraded,
        "checkpoints_lost": lost_frames,
        "track_wall_ms_p50": pct(per_frame_wall, 50),
        "track_wall_ms_p95": pct(per_frame_wall, 95),
        "mapping_ms_p50": pct(stage_hist["mapping"], 50),
        "mapping_ms_p95": pct(stage_hist["mapping"], 95),
        "loop_detect_ms_p50": pct(stage_hist["loop_detect"], 50),
        "loop_verify_ms_p50": pct(stage_hist["loop_verify"], 50),
        "loop_correct_ms_p50": pct(stage_hist["loop_correct"], 50),
        "ok": bool(lost_frames == 0 and slam.n_loops_closed >= 1
                   and ate < 0.15 and slam.kf_seq > 64),
    }
    print(json.dumps(record))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), args.out)
    with open(out, "w") as fp:
        json.dump(record, fp, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
