"""Trajectory output in the reference's exact file formats.

``System::SaveTrajectoryTUM`` / ``SaveKeyFrameTrajectoryTUM`` /
``SaveTrajectoryKITTI`` (``src/System.cc`` ~L320-480 [U]):
  * TUM:   ``timestamp tx ty tz qx qy qz qw`` (camera-to-world)
  * KITTI: 12 floats, row-major 3x4 camera-to-world matrix

Like the reference, per-frame poses are stored RELATIVE to their
reference keyframe (``mlRelativeFramePoses``) and replayed against the
final (BA/loop-corrected) keyframe poses at save time.
"""

import numpy as np

from active_orb_slam2_tpu.geometry.se3 import (
    se3_compose, se3_inverse, se3_to_mat44, quat_to_mat)


def resolve_frame_poses(rel_records, kf_poses):
    """rel_records: list of (timestamp, ref_kf_slot, Tcr [7]) per frame;
    kf_poses: final [K, 7] Tcw.  Returns (timestamps, Tcw [N, 7])."""
    import jax.numpy as jnp
    ts, poses = [], []
    for t, ref, tcr in rel_records:
        tcw = se3_compose(jnp.asarray(tcr), jnp.asarray(kf_poses[ref]))
        ts.append(t)
        poses.append(np.asarray(tcw))
    return np.array(ts), np.stack(poses) if poses else np.zeros((0, 7))


def save_tum(path, timestamps, poses_cw):
    """Write TUM format (camera-to-world)."""
    with open(path, "w") as f:
        for t, p in zip(timestamps, poses_cw):
            import jax.numpy as jnp
            twc = np.asarray(se3_inverse(jnp.asarray(p)))
            qw, qx, qy, qz = twc[:4]
            tx, ty, tz = twc[4:7]
            f.write(f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                    f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")


def save_kitti(path, poses_cw):
    """Write KITTI format: row-major 3x4 of Twc per line."""
    import jax.numpy as jnp
    with open(path, "w") as f:
        for p in poses_cw:
            m = np.asarray(se3_to_mat44(se3_inverse(jnp.asarray(p))))
            row = m[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def camera_centers(poses_cw):
    """[N, 7] Tcw -> [N, 3] camera centers in world."""
    import jax.numpy as jnp
    p = jnp.asarray(poses_cw)
    R_t = quat_to_mat(p[:, :4])
    return np.asarray(-jnp.einsum('nij,ni->nj', R_t, p[:, 4:7]))
