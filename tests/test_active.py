"""Active layer tests: occupancy, frontiers, scoring, planner, and the
full simulated exploration loop (BASELINE config #5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from active_orb_slam2_tpu.active import (
    GridSpec2D, astar_plan, build_occupancy_grid,
    build_visibility_scorer, frontier_goals, frontier_mask)
from active_orb_slam2_tpu.active.occupancy import FREE, OCCUPIED, UNKNOWN
from active_orb_slam2_tpu.active.scoring import pose_from_xz_heading
from active_orb_slam2_tpu.config import MapConfig, OrbConfig
from active_orb_slam2_tpu.geometry import CameraParams
from active_orb_slam2_tpu.models.map_state import empty_map

CAM = CameraParams(fx=260.0, fy=260.0, cx=159.5, cy=119.5, bf=20.8,
                   width=320, height=240)
SPEC = GridSpec2D(origin_x=-5.0, origin_z=-5.0, resolution=0.25,
                  width=40, height=40)


def toy_map(rng):
    """One keyframe at origin observing a wall of points at z=3."""
    m = empty_map(MapConfig(max_keyframes=8, max_points=256),
                  OrbConfig(n_features=64))
    n = 64
    xs = np.linspace(-1.5, 1.5, n)
    pts = np.stack([xs, np.zeros(n), np.full(n, 3.0)], -1)
    m = m._replace(
        kf_valid=m.kf_valid.at[0].set(True),
        kf_feat_valid=m.kf_feat_valid.at[0].set(True),
        kf_point=m.kf_point.at[0, :n].set(jnp.arange(n)),
        pt_valid=m.pt_valid.at[:n].set(True),
        pt_xyz=m.pt_xyz.at[:n].set(jnp.array(pts, jnp.float32)),
        # normal = mean viewing direction camera->point (+z here)
        pt_normal=m.pt_normal.at[:n].set(
            jnp.array([[0, 0, 1.0]] * n, jnp.float32)),
        pt_min_dist=m.pt_min_dist.at[:n].set(0.1),
        pt_max_dist=m.pt_max_dist.at[:n].set(50.0),
    )
    return m


def test_occupancy_grid(rng):
    m = toy_map(rng)
    grid = np.asarray(build_occupancy_grid(SPEC)(m))
    assert grid.shape == (40, 40)
    # endpoint cells (z=3 row) occupied
    occ_row = int((3.0 - SPEC.origin_z) / SPEC.resolution)
    assert (grid[occ_row] == OCCUPIED).sum() >= 5
    # cells along the rays free
    mid_row = int((1.5 - SPEC.origin_z) / SPEC.resolution)
    assert (grid[mid_row] == FREE).sum() >= 3
    # far corner unknown
    assert grid[0, 0] == UNKNOWN


def test_visibility_scorer(rng):
    m = toy_map(rng)
    scorer = build_visibility_scorer(CAM)
    poses = pose_from_xz_heading(
        jnp.array([0.0, 0.0]), jnp.array([0.0, 0.0]),
        jnp.array([0.0, np.pi]))   # facing the wall vs away
    counts = np.asarray(scorer(poses, m))
    assert counts[0] > 50
    assert counts[1] == 0


def test_frontier_detection():
    grid = np.full((20, 20), UNKNOWN, np.int8)
    grid[5:15, 5:15] = FREE
    goals = frontier_goals(jnp.asarray(grid))
    fm = np.asarray(frontier_mask(jnp.asarray(grid)))
    # the border of the free square is frontier
    assert fm[5, 10] and fm[14, 10] and fm[10, 5]
    assert not fm[10, 10]
    assert len(goals) > 0


def test_astar_basic():
    grid = np.full((20, 20), FREE, np.int8)
    grid[:, 10] = OCCUPIED
    grid[18, 10] = FREE               # gap at the bottom
    path = astar_plan(jnp.asarray(grid), (1, 1), (1, 18))
    assert path is not None
    assert path[0] == (1, 1) and path[-1] == (1, 18)
    rows = [r for r, c in path if c == 10]
    assert rows == [18]               # must pass through the gap


def test_astar_feature_constraint():
    grid = np.full((10, 10), FREE, np.int8)
    loc = np.full((10, 10), 100.0)
    loc[:, 5] = 0.0                   # feature desert column
    loc[9, 5] = 100.0                 # except one safe cell
    path = astar_plan(jnp.asarray(grid), (0, 0), (0, 9),
                      localizability=loc, min_features=30)
    assert path is not None
    cross = [r for r, c in path if c == 5]
    assert cross == [9]


@pytest.mark.slow
def test_exploration_loop():
    from active_orb_slam2_tpu.active.explorer import run_exploration
    from active_orb_slam2_tpu.io.synthetic import default_world
    from tests.test_e2e_rgbd import CFG
    from active_orb_slam2_tpu.models.system import System

    slam = System(CFG)
    world = default_world(n_boxes=4)
    spec = GridSpec2D(origin_x=-4.0, origin_z=-4.0, resolution=0.25,
                      width=32, height=32)
    log = run_exploration(slam, world, spec, n_steps=12,
                          start_xz=(0.0, -2.0))
    assert len(log.positions) >= 3
    assert log.replans >= 1
    # exploration must grow the known region and the map
    assert log.coverage[-1] > log.coverage[0]
    assert log.n_points[-1] >= log.n_points[0]
