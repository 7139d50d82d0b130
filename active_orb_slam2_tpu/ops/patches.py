"""Pallas keypoint patch extraction.

The keypoint stage of the ORB extractor (IC_Angle + steered BRIEF,
``src/ORBextractor.cc`` ~L70-110 / ~L700-780 [U]) needs a 2-D
neighborhood around every detected corner.  Expressing that as an XLA
gather costs ~6 cycles/element on TPU (the gather unit is scalar).

Instead, a Pallas kernel DMAs a tile-ALIGNED window around each
keypoint out of HBM (Mosaic requires DMA offsets divisible by the
(8, 128) tiling, so the window is 56 rows x 256 lanes with the patch at
a known in-window offset), and the exact 40x40 patch is then cut out
with two batched one-hot matmuls on the MXU — exact, because raw pixel
values are small integers and the one-hot factors are 0/1.

Everything downstream (per-patch Gaussian blur, intensity-centroid
moments, BRIEF taps) is batched matmuls too — see ``ops/orb.py``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 40      # raw patch side: 31 (BRIEF/IC) + 2*3 (blur halo) -> pad to 40
_ROWS = 56      # aligned window rows: 8-aligned start + up to 15 skew + 40
_BLOCK = 8      # keypoints per grid step


def _use_interpret():
    # Pallas TPU kernels go through the Mosaic compiler on tpu-like
    # backends; everywhere else (CPU tests) use the interpreter.
    return jax.default_backend() not in ("tpu", "axon")


@functools.lru_cache(maxsize=None)
def _window_call(hp: int, wp: int, kp: int, lanes: int):
    grid = (kp // _BLOCK,)

    def kernel(ya_ref, xa_ref, img_ref, out_ref, sems):
        i = pl.program_id(0)
        dmas = []
        for j in range(_BLOCK):
            idx = i * _BLOCK + j
            y0 = pl.multiple_of(ya_ref[idx], 8)
            x0 = pl.multiple_of(xa_ref[idx], 128)
            dma = pltpu.make_async_copy(
                img_ref.at[pl.ds(y0, _ROWS), pl.ds(x0, lanes)],
                out_ref.at[j],
                sems.at[j])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((_BLOCK, _ROWS, lanes),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_BLOCK,))],
        ),
        out_shape=jax.ShapeDtypeStruct((kp, _ROWS, lanes), jnp.float32),
        interpret=_use_interpret(),
    )


def extract_patches(img_padded, ys, xs, pad: int):
    """Gather [K, 40, 40] raw patches centered on (ys, xs).

    ``img_padded`` [Hp, Wp] float32 (level image with >= 21 px border);
    ys/xs [K] int32 keypoint coords in unpadded image space.  The patch
    covers offsets [-18, +21] around the keypoint: BRIEF/IC need +-15,
    the 7x7 blur halo +-18; rows/cols beyond +18 are alignment slack.
    """
    K = ys.shape[0]
    kp = -(-K // _BLOCK) * _BLOCK
    hp, wp = img_padded.shape
    # Mosaic DMA slices must be (8, 128)-tile aligned in offset AND
    # size: pad the image to tile multiples (cheap, fused by XLA)
    hp8 = -(-hp // 8) * 8
    wp128 = -(-wp // 128) * 128
    if (hp8, wp128) != (hp, wp):
        img_padded = jnp.pad(img_padded, ((0, hp8 - hp), (0, wp128 - wp)))
    lanes = wp128 if wp128 <= 256 else 256
    y0 = jnp.clip(ys + pad - 18, 0, hp - PATCH).astype(jnp.int32)
    x0 = jnp.clip(xs + pad - 18, 0, wp - PATCH).astype(jnp.int32)
    ya = jnp.clip((y0 // 8) * 8, 0, hp8 - _ROWS)
    xa = jnp.clip((x0 // 128) * 128, 0, wp128 - lanes)
    ry = y0 - ya                                   # [0, 15]
    rx = x0 - xa                                   # [0, lanes - 40]
    win = _window_call(hp8, wp128, kp, lanes)(
        jnp.pad(ya, (0, kp - K)), jnp.pad(xa, (0, kp - K)), img_padded)
    win = win[:K]

    # cut the exact patch out of the window with one-hot matmuls (the
    # MXU as a shift engine — raw pixels are integers, so bf16 is exact)
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, PATCH, _ROWS), 2)
    R = (rows == (ry[:, None, None]
                  + jax.lax.broadcasted_iota(
                      jnp.int32, (K, PATCH, _ROWS), 1))).astype(jnp.bfloat16)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, lanes, PATCH), 1)
    C = (cols == (rx[:, None, None]
                  + jax.lax.broadcasted_iota(
                      jnp.int32, (K, lanes, PATCH), 2))).astype(jnp.bfloat16)
    a = jnp.einsum('krp,kpq->krq', R, win.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    out = jnp.einsum('krq,kqc->krc', a.astype(jnp.bfloat16), C,
                     preferred_element_type=jnp.float32)
    return out
