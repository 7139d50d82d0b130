"""Active exploration loop over a simulated RGB-D world.

BASELINE config #5: goal -> plan -> follow -> replan, with the SLAM
system in the loop (SURVEY.md §3.5's nav loop, ROS/Gazebo replaced by
the synthetic renderer).  Each iteration:

  1. render an RGB-D frame at the current pose, feed SLAM;
  2. rebuild the occupancy grid from the (live) map arena;
  3. detect frontier goals; score candidate viewpoints with the
     batched localizability kernel;
  4. A* a feature-safe path to the best goal (information gain x
     localizability, the paper's utility);
  5. advance along the path; repeat.
"""

from typing import NamedTuple

import numpy as np

from active_orb_slam2_tpu.active.frontier import frontier_goals
from active_orb_slam2_tpu.active.occupancy import (
    FREE, GridSpec2D, build_occupancy_grid)
from active_orb_slam2_tpu.active.planner import astar_plan
from active_orb_slam2_tpu.active.scoring import (
    build_visibility_scorer, pose_from_xz_heading,
    score_grid_localizability)
from active_orb_slam2_tpu.io.synthetic import render_rgbd


class ExploreLog(NamedTuple):
    positions: list        # [(x, z)] visited
    n_points: list         # map size over time
    coverage: list         # known-cell fraction over time
    replans: int


def _pose44_from_xz_heading(x, z, heading, y=0.0):
    cy, sy = np.cos(heading), np.sin(heading)
    T = np.eye(4, dtype=np.float32)
    # camera z-axis = world heading direction (matches loop_trajectory)
    fwd = np.array([sy, 0, cy], np.float32)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(up, fwd)
    T[:3, 0], T[:3, 1], T[:3, 2] = right, up, fwd
    T[:3, 3] = (x, y, z)
    return T


def run_exploration(slam, world, spec: GridSpec2D, n_steps: int = 30,
                    start_xz=(0.0, -1.0), start_heading: float = 0.0,
                    min_features: int = 30, step_cells: int = 2,
                    timestamp0: float = 0.0):
    """Drive the SLAM system actively through ``world``.

    ``slam`` is a System (RGB-D).  Returns an ExploreLog.
    """
    occupancy = build_occupancy_grid(spec)
    scorer = build_visibility_scorer(slam.cfg.camera)

    x, z = start_xz
    heading = start_heading
    log = ExploreLog([], [], [], 0)
    t = timestamp0

    def feed(px, pz, ph):
        nonlocal t
        Twc = _pose44_from_xz_heading(px, pz, ph)
        gray, depth = render_rgbd(world, slam.cfg.camera, Twc)
        slam.track_rgbd(gray, depth, t)
        t += 1.0 / 30.0

    def recover():
        """Lost mid-motion: rotate in place until relocalization bites
        (the nav-stack's recovery behaviour; drives the reloc path)."""
        nonlocal heading
        from active_orb_slam2_tpu.models.system import LOST
        for _ in range(100):
            if slam.state != LOST:
                return True
            heading -= 0.06
            feed(x, z, heading)
        return slam.state != LOST

    def move_to(nx, nz, nh, max_step=0.1, max_turn=0.06):
        """Robot-like motion: substep the pose so SLAM sees ~30 fps
        continuity (turn first, then translate)."""
        nonlocal x, z, heading
        from active_orb_slam2_tpu.models.system import LOST
        dh = (nh - heading + np.pi) % (2 * np.pi) - np.pi
        for _ in range(int(abs(dh) / max_turn)):
            heading += np.sign(dh) * max_turn
            feed(x, z, heading)
            if slam.state == LOST and not recover():
                return
        heading = nh
        d = np.hypot(nx - x, nz - z)
        n_sub = max(int(d / max_step), 1)
        x0, z0 = x, z
        for i in range(1, n_sub + 1):
            feed(x0 + (nx - x0) * i / n_sub, z0 + (nz - z0) * i / n_sub,
                 heading)
            if slam.state == LOST and not recover():
                x, z = (x0 + (nx - x0) * i / n_sub,
                        z0 + (nz - z0) * i / n_sub)
                return
        x, z = nx, nz

    feed(x, z, heading)
    for step in range(n_steps):
        log.positions.append((x, z))
        log.n_points.append(int(np.asarray(slam.map.pt_valid.sum())))

        grid = np.asarray(occupancy(slam.map))
        known = float((grid != -1).mean())
        log.coverage.append(known)

        goals = frontier_goals(grid)
        if not goals:
            break
        # localizability sweep (device-batched) at 8 headings
        loc = score_grid_localizability(scorer, slam.map, spec,
                                        headings=8, cell_stride=2)
        loc_max = loc.max(-1)
        loc_full = np.kron(loc_max, np.ones((2, 2)))[
            :spec.height, :spec.width]

        def cell_of(px, pz):
            return (int((pz - spec.origin_z) / spec.resolution),
                    int((px - spec.origin_x) / spec.resolution))

        start_cell = cell_of(x, z)
        path = None
        for gr, gc, _size in goals[:5]:
            path = astar_plan(grid, start_cell, (gr, gc),
                              localizability=loc_full,
                              min_features=min_features, unknown_ok=True)
            if path and len(path) > 1:
                break
        if not path or len(path) <= 1:
            break
        log = log._replace(replans=log.replans + 1)

        # advance a couple of cells along the path, facing the motion
        nxt = path[min(step_cells, len(path) - 1)]
        nx = spec.origin_x + (nxt[1] + 0.5) * spec.resolution
        nz = spec.origin_z + (nxt[0] + 0.5) * spec.resolution
        if np.hypot(nx - x, nz - z) < 1e-6:
            break
        move_to(nx, nz, float(np.arctan2(nx - x, nz - z)))
    return log
