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
