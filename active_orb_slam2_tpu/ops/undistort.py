"""Keypoint undistortion: iterative radial-tangential inverse.

Replaces ``Frame::UndistortKeyPoints`` + ``ComputeImageBounds``
(``src/Frame.cc`` ~L330-390 [U]).  The reference calls
``cv::undistortPoints`` on the detected keypoints so that all geometry
downstream (matching gates, triangulation, BA residuals) operates in an
ideal pinhole model; we do the same with a fixed-iteration Newton-free
fixed-point inverse of the radtan model — branch-free, fully batched,
and exact to < 1e-3 px for the distortion magnitudes of the reference's
datasets (TUM fr1 k1 ~ 0.26).

Forward model (OpenCV radtan, the distortion the YAML
``Camera.{k1,k2,p1,p2,k3}`` parameters describe):

  x_d = x (1 + k1 r^2 + k2 r^4 + k3 r^6) + 2 p1 x y + p2 (r^2 + 2 x^2)
  y_d = y (1 + k1 r^2 + k2 r^4 + k3 r^6) + p1 (r^2 + 2 y^2) + 2 p2 x y

with (x, y) normalized image coordinates.  The inverse iterates
``(x, y) <- ((x_d - dx) / radial, (y_d - dy) / radial)`` from
``(x_d, y_d)`` — the same scheme cv::undistortPoints uses.
"""

import jax.numpy as jnp
import numpy as np


def distort_normalized(dist, x, y):
    """Forward radtan on normalized coords (oracle + warp helper)."""
    k1, k2, p1, p2, k3 = dist
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    x_d = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    y_d = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return x_d, y_d


def undistort_points(cam, dist, uv, iters: int = 8):
    """Distorted pixel coords [N, 2] -> undistorted pixel coords [N, 2].

    ``dist`` is the static (k1, k2, p1, p2, k3) tuple; when all zeros
    the caller should skip this entirely (trace-time decision).
    """
    k1, k2, p1, p2, k3 = (float(v) for v in dist)
    x_d = (uv[:, 0] - cam.cx) / cam.fx
    y_d = (uv[:, 1] - cam.cy) / cam.fy
    x, y = x_d, y_d
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x_d - dx) / radial
        y = (y_d - dy) / radial
    return jnp.stack([x * cam.fx + cam.cx, y * cam.fy + cam.cy], axis=-1)


def compute_image_bounds(cam, dist):
    """Undistorted image bounds (min_x, max_x, min_y, max_y) from the
    four corners, as ``Frame::ComputeImageBounds`` [U].  NumPy/host —
    called once at pipeline-build time."""
    if not any(float(v) != 0.0 for v in dist):
        return 0.0, float(cam.width), 0.0, float(cam.height)
    corners = np.array([[0.0, 0.0], [cam.width, 0.0],
                        [0.0, cam.height], [cam.width, cam.height]],
                       np.float64)
    und = np.asarray(undistort_points(cam, dist, jnp.asarray(corners)))
    return (float(min(und[0, 0], und[2, 0])),
            float(max(und[1, 0], und[3, 0])),
            float(min(und[0, 1], und[1, 1])),
            float(max(und[2, 1], und[3, 1])))


def distort_warp_image(cam, dist, img):
    """Render a DISTORTED view of an ideal pinhole image (test/synthetic
    helper): output pixel p samples the source at undistort(p) — i.e.
    the source image is treated as the undistorted (ideal) view.
    Host-side NumPy bilinear warp."""
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    uv = np.stack([xs.ravel(), ys.ravel()], axis=-1)
    src = np.asarray(undistort_points(cam, dist, jnp.asarray(uv)))
    sx = np.clip(src[:, 0], 0, w - 1.001)
    sy = np.clip(src[:, 1], 0, h - 1.001)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx_ = sx - x0
    fy_ = sy - y0
    im = img.astype(np.float64)
    out = (im[y0, x0] * (1 - fx_) * (1 - fy_)
           + im[y0, x0 + 1] * fx_ * (1 - fy_)
           + im[y0 + 1, x0] * (1 - fx_) * fy_
           + im[y0 + 1, x0 + 1] * fx_ * fy_)
    return out.reshape(h, w)
