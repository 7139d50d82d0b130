"""Pallas keypoint patch extraction.

The keypoint stage of the ORB extractor (IC_Angle + steered BRIEF,
``src/ORBextractor.cc`` ~L70-110 / ~L700-780 [U]) needs a 2-D
neighborhood around every detected corner.  Expressing that as an XLA
gather costs ~6 cycles/element on TPU (the gather unit is scalar); this
kernel instead slices each patch out of the VMEM-resident level image
with vectorized dynamic slices — the image is loaded once, and patches
stream out at VPU copy speed.

Everything downstream (per-patch Gaussian blur, intensity-centroid
moments, BRIEF taps) then becomes batched matmuls on the MXU — see
``ops/orb.py``.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 40      # raw patch side: 31 (BRIEF/IC) + 2*3 (blur halo) -> pad to 40
_BLOCK = 8      # keypoints per grid step


def _use_interpret():
    # Pallas TPU kernels run via the Mosaic compiler on tpu-like
    # backends; everywhere else (CPU tests) use the interpreter.
    return jax.default_backend() not in ("tpu", "axon")


@functools.lru_cache(maxsize=None)
def _patch_call(hp: int, wp: int, kp: int):
    grid = (kp // _BLOCK,)

    def kernel(y_ref, x_ref, img_ref, out_ref):
        i = pl.program_id(0)
        for j in range(_BLOCK):
            idx = i * _BLOCK + j
            y0 = y_ref[idx]
            x0 = x_ref[idx]
            out_ref[j] = img_ref[pl.ds(y0, PATCH), pl.ds(x0, PATCH)]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_BLOCK, PATCH, PATCH),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((kp, PATCH, PATCH), jnp.float32),
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
    y0 = jnp.clip(ys + pad - 18, 0, hp - PATCH).astype(jnp.int32)
    x0 = jnp.clip(xs + pad - 18, 0, wp - PATCH).astype(jnp.int32)
    y0 = jnp.pad(y0, (0, kp - K))
    x0 = jnp.pad(x0, (0, kp - K))
    out = _patch_call(hp, wp, kp)(y0, x0, img_padded)
    return out[:K]
