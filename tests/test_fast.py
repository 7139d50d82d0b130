"""FAST corner kernel vs a pure-Python oracle (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from active_orb_slam2_tpu.ops.fast import (
    fast_score_map, nms3x3, CIRCLE_OFFSETS, ARC_LEN)


def oracle_is_corner(img, y, x, t):
    """Straightforward FAST-9/16 arc test."""
    c = img[y, x]
    ring = np.array([img[y + dy, x + dx] for dy, dx in CIRCLE_OFFSETS])
    for start in range(16):
        idx = [(start + i) % 16 for i in range(ARC_LEN)]
        if all(ring[i] > c + t for i in idx):
            return True
        if all(ring[i] < c - t for i in idx):
            return True
    return False


def test_fast_matches_oracle(rng):
    img = rng.uniform(0, 255, size=(48, 64)).astype(np.float32)
    score = np.asarray(fast_score_map(jnp.array(img)))
    t = 20.0
    ys, xs = np.mgrid[4:44:4, 4:60:5]
    for y, x in zip(ys.ravel(), xs.ravel()):
        want = oracle_is_corner(img, y, x, t)
        got = score[y, x] > t
        assert got == want, (y, x, score[y, x], want)


def test_fast_synthetic_corner():
    """A bright square on dark background: its corners must score high,
    flat interior must score 0."""
    img = np.zeros((64, 64), dtype=np.float32)
    img[20:40, 20:40] = 200.0
    score = np.asarray(fast_score_map(jnp.array(img)))
    # corner region should contain strong corners
    assert score[19:22, 19:22].max() > 100
    # flat interior: nothing
    assert score[28:32, 28:32].max() == 0.0
    # straight edge midpoint is not a FAST-9 corner
    assert score[30, 19:21].max() == 0.0


def test_nms_keeps_single_peak():
    s = np.zeros((16, 16), dtype=np.float32)
    s[8, 8] = 5.0
    s[8, 9] = 4.0  # neighbour should be suppressed
    out = np.asarray(nms3x3(jnp.array(s)))
    assert out[8, 8] == 5.0 and out[8, 9] == 0.0
