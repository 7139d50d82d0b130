"""Image primitives: separable Gaussian blur, bilinear resize, padding.

Replaces the reference's OpenCV usage in the ORB front end:
``cv::GaussianBlur(7x7, sigma=2)`` and ``cv::resize`` inside
``ORBextractor::ComputePyramid`` (``src/ORBextractor.cc`` ~L550-600 [U]).
Pure XLA: separable blur as two depthwise 1-D convolutions (fused by
XLA), resize via jax.image.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(ksize: int, sigma: float):
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur of [H, W] (edge-replicate padding)."""
    k = jnp.asarray(_gaussian_kernel1d(ksize, sigma))
    r = ksize // 2
    x = img[None, None]                          # [1, 1, H, W]
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (r, r)), mode="edge")
    kh = k.reshape(1, 1, ksize, 1)
    kw = k.reshape(1, 1, 1, ksize)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn)
    return x[0, 0]


def resize_bilinear(img, out_h: int, out_w: int):
    """Bilinear resize of [H, W] to [out_h, out_w]."""
    return jax.image.resize(img, (out_h, out_w), method="bilinear")


def pad_image(img, pad: int):
    """Edge-replicate pad on both axes (reference EDGE_THRESHOLD border)."""
    return jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")
