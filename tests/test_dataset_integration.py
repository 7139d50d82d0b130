"""Full dataset-path integration: write a TUM-format sequence from the
synthetic world (16-bit depth PNGs, rgb/depth/groundtruth txt), load it
through the reference-compatible loaders (native decoder), run the
System, self-evaluate ATE — the config-#1-shaped flow end-to-end."""

import os

import numpy as np
import pytest

from active_orb_slam2_tpu.config import load_settings
from active_orb_slam2_tpu.io.datasets import TumRgbdDataset
from active_orb_slam2_tpu.io.synthetic import (
    default_world, make_sequence, orbit_trajectory)
from active_orb_slam2_tpu.models.system import OK, System
from active_orb_slam2_tpu.utils.evaluate import evaluate_ate_tum

from tests.test_e2e_rgbd import CAM, CFG

TUM_YAML = """%YAML:1.0
Camera.fx: 260.0
Camera.fy: 260.0
Camera.cx: 159.5
Camera.cy: 119.5
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 30.0
Camera.bf: 20.8
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 512
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("tum_seq")
    (d / "rgb").mkdir()
    (d / "depth").mkdir()
    n = 16
    rgb_lines, dep_lines, gt_lines = [], [], []
    for i, (g, dep, Twc) in enumerate(make_sequence(
            n, CAM, world=default_world(),
            trajectory=orbit_trajectory(n, step_deg=2.0))):
        t = 1000.0 + i / 30.0
        Image.fromarray(np.clip(g, 0, 255).astype(np.uint8), "L").save(
            d / "rgb" / f"{t:.6f}.png")
        d16 = np.clip(dep * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(d / "depth" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        dep_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        # groundtruth: tx ty tz qx qy qz qw of camera-to-world
        from active_orb_slam2_tpu.geometry import mat44_to_se3
        import jax.numpy as jnp
        p = np.asarray(mat44_to_se3(jnp.array(Twc)))
        gt_lines.append(
            f"{t:.6f} {p[4]} {p[5]} {p[6]} {p[1]} {p[2]} {p[3]} {p[0]}")
    (d / "rgb.txt").write_text(
        "# color images\n" + "\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text(
        "# depth images\n" + "\n".join(dep_lines) + "\n")
    (d / "groundtruth.txt").write_text(
        "# gt\n" + "\n".join(gt_lines) + "\n")
    (d / "TUM_synth.yaml").write_text(TUM_YAML)
    return d


def test_load_settings_yaml(tum_dir):
    cfg = load_settings(str(tum_dir / "TUM_synth.yaml"), sensor="rgbd")
    assert cfg.camera.fx == 260.0
    assert cfg.camera.bf == 20.8
    assert cfg.orb.n_features == 512
    assert cfg.orb.n_levels == 4
    assert abs(cfg.tracking.th_depth - 40.0 * 20.8 / 260.0) < 1e-6


def test_tum_loader_and_association(tum_dir):
    ds = TumRgbdDataset(str(tum_dir))
    assert len(ds) == 16
    t, gray, depth_mm = next(iter(ds))
    assert gray.dtype == np.uint8 and gray.shape == (240, 320)
    assert depth_mm.dtype == np.uint16
    # depth roundtrip: 5000-factor png -> mm
    assert 1000 < np.median(depth_mm[depth_mm > 0]) < 12000


@pytest.mark.slow
def test_full_cli_flow(tum_dir, tmp_path):
    """The run_tum_rgbd.py flow as a function: loaders -> System ->
    trajectory save -> in-repo ATE vs groundtruth.txt."""
    ds = TumRgbdDataset(str(tum_dir))
    slam = System(CFG)
    for t, gray, depth_mm in ds:
        slam.track_rgbd(gray, depth_mm, t)
    assert slam.state == OK
    traj = tmp_path / "CameraTrajectory.txt"
    slam.save_trajectory_tum(str(traj))
    data = np.loadtxt(traj)
    assert data.shape == (16, 8)
    # timestamps preserved
    np.testing.assert_allclose(data[0, 0], 1000.0, atol=1e-3)
    rmse = evaluate_ate_tum(slam, ds.groundtruth())
    assert rmse < 0.05, rmse


EUROC_RECT_YAML = """%YAML:1.0
Camera.fx: 435.2
Camera.fy: 435.2
Camera.cx: 367.4
Camera.cy: 252.2
Camera.bf: 47.9
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
ThDepth: 35.0
LEFT.height: 480
LEFT.width: 752
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0.0, 367.4, 0.0, 0.0, 435.2, 252.2, 0.0, 0.0, 0.0, 1.0, 0.0]
RIGHT.height: 480
RIGHT.width: 752
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0.0, 367.4, -47.9, 0.0, 435.2, 252.2, 0.0, 0.0, 0.0, 1.0, 0.0]
"""


def test_euroc_rectification_roundtrip(tmp_path):
    """LEFT/RIGHT blocks -> rectify maps -> remap (stereo_euroc.cc [U]).

    With zero distortion and K == P the map must be the identity."""
    from active_orb_slam2_tpu.config import load_rectification
    from active_orb_slam2_tpu.io.datasets import (
        remap_bilinear, stereo_rectify_maps)

    y = tmp_path / "EuRoC.yaml"
    y.write_text(EUROC_RECT_YAML)
    blocks = load_rectification(str(y))
    assert blocks is not None
    (mlx, mly), (mrx, mry) = stereo_rectify_maps(*blocks)
    assert mlx.shape == (480, 752)

    # distorted maps bend toward the borders but stay near-identity at
    # the principal point
    cy, cx = 252, 367
    assert abs(mlx[cy, cx] - cx) < 3.0 and abs(mly[cy, cx] - cy) < 6.0

    # identity case: no distortion, R=I, P=K
    K = blocks[0]
    P = np.concatenate([K, np.zeros((3, 1))], 1)
    (ilx, ily), _ = stereo_rectify_maps(
        K, np.zeros(5), np.eye(3), P, K, np.zeros(5), np.eye(3), P,
        752, 480)
    ys, xs = np.mgrid[0:480, 0:752]
    np.testing.assert_allclose(ilx, xs, atol=1e-9)
    np.testing.assert_allclose(ily, ys, atol=1e-9)
    img = (np.arange(480 * 752) % 251).reshape(480, 752).astype(np.uint8)
    out = remap_bilinear(img, ilx, ily)
    np.testing.assert_array_equal(out[1:-1, 1:-1], img[1:-1, 1:-1])


def test_no_rectification_returns_none(tum_dir):
    from active_orb_slam2_tpu.config import load_rectification
    assert load_rectification(str(tum_dir / "TUM_synth.yaml")) is None
