"""Frontier detection on the occupancy grid.

Free cells adjacent to unknown cells, clustered into goal candidates
(SURVEY.md §2.4): a 3x3 stencil for the mask, coarse pooling for the
clustering — both trivially vectorized.
"""

import jax
import jax.numpy as jnp
import numpy as np

from active_orb_slam2_tpu.active.occupancy import FREE, UNKNOWN


@jax.jit
def frontier_mask(grid):
    """[H, W] int8 occupancy -> bool mask of frontier cells."""
    unk = (grid == UNKNOWN)
    # 3x3 dilation of unknown
    p = jnp.pad(unk, 1)
    near_unknown = jnp.zeros_like(unk)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            near_unknown |= p[1 + dy:1 + dy + grid.shape[0],
                              1 + dx:1 + dx + grid.shape[1]]
    return (grid == FREE) & near_unknown


def frontier_goals(grid, pool: int = 4, min_cells: int = 3):
    """Cluster frontier cells by coarse pooling; returns [(row, col,
    size)] goal candidates (cell coords of cluster centroids), numpy."""
    fm = np.asarray(frontier_mask(grid))
    h, w = fm.shape
    hp, wp = h // pool, w // pool
    goals = []
    for i in range(hp):
        for j in range(wp):
            blk = fm[i * pool:(i + 1) * pool, j * pool:(j + 1) * pool]
            n = int(blk.sum())
            if n >= min_cells:
                ys, xs = np.nonzero(blk)
                goals.append((i * pool + ys.mean(), j * pool + xs.mean(),
                              n))
    goals.sort(key=lambda g: -g[2])
    return goals
