"""ORB feature extraction: pyramid -> FAST -> distribute -> orient -> rBRIEF.

TPU-native redesign of the reference's ``ORBextractor::operator()``
(``src/ORBextractor.cc`` ~L740, the #1 hot kernel — SURVEY.md §3.2):

  * ``ComputePyramid`` (~L550) -> static per-level resize chain.
  * per-cell FAST w/ threshold fallback + ``DistributeOctTree`` (~L400)
    -> one corner-score map per level, per-cell top-k candidates, then a
    global per-level top-n_l by response.  The quadtree's goal (spatially
    uniform best-response selection) is preserved; the data-dependent
    tree walk is not (SURVEY.md §7.4 item 1).
  * ``IC_Angle`` (~L70) -> batched circular-patch moments over gathered
    31x31 patches.
  * ``GaussianBlur + computeOrbDescriptor`` (~L700) -> separable blur,
    then steered 256-pair BRIEF sampled with one [K, 256] gather; bits
    packed into uint32[8] so Hamming distance rides
    ``lax.population_count`` (and a ±1 bit-matmul on the MXU).

Divergence note: the reference's learned ``bit_pattern_31_`` table is
not reproduced (no copying); we generate a deterministic BRIEF G-II
pattern (p1 ~ N(0, (S/5)^2), p2 ~ N(p1, (S/10)^2), seed 1234).  The
vocabulary is self-trained on the same descriptors, so internal
consistency is what matters (SURVEY.md §7.2 phase 6).

Everything is fixed-shape: exactly ``n_features`` slots with a validity
mask come out regardless of image content.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from active_orb_slam2_tpu.config import OrbConfig
from active_orb_slam2_tpu.ops.image import gaussian_blur, resize_bilinear, pad_image
from active_orb_slam2_tpu.ops.fast import fast_score_map, nms3x3

HALF_PATCH = 15  # IC_Angle / BRIEF patch radius (reference PATCH_SIZE=31)


class OrbFeatures(NamedTuple):
    """Fixed-size feature set for one frame (mask-valid slots)."""
    uv: jnp.ndarray        # [N, 2] float32 — (x, y) at level-0 scale
    level: jnp.ndarray     # [N] int32 — pyramid octave
    angle: jnp.ndarray     # [N] float32 — orientation (radians)
    response: jnp.ndarray  # [N] float32 — FAST corner score
    desc: jnp.ndarray      # [N, 8] uint32 — 256-bit rBRIEF
    valid: jnp.ndarray     # [N] bool


@functools.lru_cache(maxsize=None)
def descriptor_pattern(seed: int = 1234):
    """Deterministic 256-pair BRIEF sampling pattern [256, 4] int32
    (x1, y1, x2, y2), clipped to the 31x31 patch."""
    rng = np.random.default_rng(seed)
    s = 2 * HALF_PATCH + 1
    p1 = rng.normal(0.0, s / 5.0, size=(256, 2))
    p2 = p1 + rng.normal(0.0, s / 10.0, size=(256, 2))
    pat = np.concatenate([p1, p2], axis=1)
    pat = np.clip(np.round(pat), -HALF_PATCH, HALF_PATCH).astype(np.int32)
    return pat  # columns: x1, y1, x2, y2


@functools.lru_cache(maxsize=None)
def _circular_mask():
    """Boolean [31, 31] circular patch mask (radius 15) and coordinate
    grids for the intensity-centroid moments (numpy; converted to device
    constants at trace time — caching jnp arrays leaks tracers)."""
    r = HALF_PATCH
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    mask = (xs * xs + ys * ys) <= r * r + 1
    return (mask.astype(np.float32), xs.astype(np.float32),
            ys.astype(np.float32))


def _level_sizes(h: int, w: int, cfg: OrbConfig):
    return [(max(int(round(h / cfg.scale_factor ** l)), 64),
             max(int(round(w / cfg.scale_factor ** l)), 64))
            for l in range(cfg.n_levels)]


def _features_per_level(cfg: OrbConfig):
    """Geometric distribution of the feature budget over levels, exactly
    as the reference's ORBextractor ctor (nDesiredFeaturesPerScale [U])."""
    f = 1.0 / cfg.scale_factor
    n0 = cfg.n_features * (1 - f) / (1 - f ** cfg.n_levels)
    ns = [int(round(n0 * f ** l)) for l in range(cfg.n_levels - 1)]
    ns.append(max(cfg.n_features - sum(ns), 0))
    return ns


def _detect_level(score, n_keep: int, cfg: OrbConfig):
    """Distribute: per-cell top-k candidates -> global top-n_keep.

    ``score`` is the NMS'd corner-score map with the iniTh/minTh
    per-cell fallback already applied.  Returns (ys, xs, resp) with
    fixed length n_keep; resp == 0 marks empty slots.
    """
    h, w = score.shape
    cs = cfg.cell_size
    hc, wc = -(-h // cs), -(-w // cs)
    pad_h, pad_w = hc * cs - h, wc * cs - w
    sp = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    cells = sp.reshape(hc, cs, wc, cs).transpose(0, 2, 1, 3)
    cells = cells.reshape(hc * wc, cs * cs)
    vals, idx = jax.lax.top_k(cells, cfg.cell_top_k)      # [C, k]
    cell_ids = jnp.arange(hc * wc, dtype=jnp.int32)[:, None]
    ys = (cell_ids // wc) * cs + idx // cs
    xs = (cell_ids % wc) * cs + idx % cs
    vflat, yflat, xflat = vals.ravel(), ys.ravel(), xs.ravel()
    resp, take = jax.lax.top_k(vflat, n_keep)
    return yflat[take], xflat[take], resp


def _threshold_fallback(score, cfg: OrbConfig):
    """Reference behaviour: detect at iniThFAST; cells with no such
    corner fall back to minThFAST (``ComputeKeyPointsOctTree`` [U])."""
    h, w = score.shape
    cs = cfg.cell_size
    hc, wc = -(-h // cs), -(-w // cs)
    pass_hi = score > cfg.ini_th_fast
    ph = jnp.pad(pass_hi, ((0, hc * cs - h), (0, wc * cs - w)))
    cell_has_hi = ph.reshape(hc, cs, wc, cs).any(axis=(1, 3))
    cell_has_hi = jnp.repeat(jnp.repeat(cell_has_hi, cs, 0), cs, 1)[:h, :w]
    eligible = (score > cfg.min_th_fast) & (pass_hi | ~cell_has_hi)
    return jnp.where(eligible, score, 0.0)


def _ic_angle(img_padded, ys, xs, pad: int):
    """Batched intensity-centroid orientation (reference IC_Angle [U])."""
    mask_np, gx_np, gy_np = _circular_mask()
    mask, gx, gy = jnp.asarray(mask_np), jnp.asarray(gx_np), jnp.asarray(gy_np)

    def one(y, x):
        patch = jax.lax.dynamic_slice(
            img_padded, (y + pad - HALF_PATCH, x + pad - HALF_PATCH),
            (2 * HALF_PATCH + 1, 2 * HALF_PATCH + 1))
        m10 = jnp.sum(mask * gx * patch)
        m01 = jnp.sum(mask * gy * patch)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(ys, xs)


def _descriptors(blur_padded, ys, xs, angles, pad: int):
    """Steered BRIEF: rotate the pattern per keypoint, gather, pack bits."""
    pat = jnp.asarray(descriptor_pattern())                 # [256, 4]
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
    c, s = jnp.cos(angles)[:, None], jnp.sin(angles)[:, None]

    def rot(px, py):
        rx = jnp.round(c * px[None, :] - s * py[None, :]).astype(jnp.int32)
        ry = jnp.round(s * px[None, :] + c * py[None, :]).astype(jnp.int32)
        return rx, ry

    rx1, ry1 = rot(x1, y1)
    rx2, ry2 = rot(x2, y2)
    r0 = (ys + pad)[:, None]
    c0 = (xs + pad)[:, None]
    v1 = blur_padded[r0 + ry1, c0 + rx1]                    # [K, 256]
    v2 = blur_padded[r0 + ry2, c0 + rx2]
    bits = (v1 < v2).astype(jnp.uint32)                     # [K, 256]
    lanes = bits.reshape(bits.shape[0], 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(lanes * weights[None, None, :], axis=-1,
                   dtype=jnp.uint32)                        # [K, 8]


def build_extractor(cfg: OrbConfig, height: int, width: int):
    """Return a jit-compiled ``image [H, W] float32 -> OrbFeatures``.

    Static shapes throughout; call once per (cfg, H, W).
    """
    sizes = _level_sizes(height, width, cfg)
    n_per_level = _features_per_level(cfg)
    pad = cfg.pad

    def extract(img):
        outs = []
        level_img = img
        for lvl in range(cfg.n_levels):
            h, w = sizes[lvl]
            if lvl > 0:
                level_img = resize_bilinear(level_img, h, w)
            score = nms3x3(fast_score_map(level_img))
            score = _threshold_fallback(score, cfg)
            n_l = n_per_level[lvl]
            ys, xs, resp = _detect_level(score, n_l, cfg)
            padded = pad_image(level_img, pad)
            ang = _ic_angle(padded, ys, xs, pad)
            blurp = gaussian_blur(padded)
            desc = _descriptors(blurp, ys, xs, ang, pad)
            scale = cfg.scale_factor ** lvl
            uv = jnp.stack([xs.astype(jnp.float32) * scale,
                            ys.astype(jnp.float32) * scale], axis=-1)
            outs.append(OrbFeatures(
                uv=uv,
                level=jnp.full((n_l,), lvl, jnp.int32),
                angle=ang,
                response=resp,
                desc=desc,
                valid=resp > 0.0,
            ))
        return OrbFeatures(*[jnp.concatenate(parts, axis=0)
                             for parts in zip(*outs)])

    return jax.jit(extract)
