"""Feature-visibility (localizability) scoring of candidate viewpoints.

The paper's core constraint (SURVEY.md §2.4): a pose is 'feature-safe'
when enough map points pass an isInFrustum-style test from it.  This is
the BASELINE.json 'vectorized on-device scoring kernel feeding the
planner': one batched program scoring THOUSANDS of candidate poses
against the whole point arena — the planner's validity oracle becomes a
single device call instead of per-state checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from active_orb_slam2_tpu.geometry.projection import CameraParams, in_frustum
from active_orb_slam2_tpu.geometry.se3 import quat_from_axis_angle
from active_orb_slam2_tpu.models.map_state import MapState


def build_visibility_scorer(cam: CameraParams):
    """Compile (poses [Q, 7], m) -> visible-feature counts [Q]."""

    @jax.jit
    def score(poses, m: MapState):
        def one(pose):
            ok, *_ = in_frustum(cam, pose, m.pt_xyz, m.pt_normal,
                                m.pt_min_dist, m.pt_max_dist)
            return (ok & m.pt_valid).sum().astype(jnp.int32)
        return jax.vmap(one)(poses)

    return score


def pose_from_xz_heading(x, z, heading, y: float = 0.0):
    """World (x, z) position + heading about +y -> Tcw [. , 7].

    Heading 0 looks along +z; the camera convention matches
    io/synthetic.py's loop trajectory.
    """
    x, z, heading = (jnp.asarray(v, jnp.float32) for v in (x, z, heading))
    axis = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]),
                            heading.shape + (3,))
    # camera-to-world rotation: R_wc = R_y(heading); Tcw = inverse
    q_wc = quat_from_axis_angle(axis, heading)
    from active_orb_slam2_tpu.geometry.se3 import quat_conj, quat_rotate
    q_cw = quat_conj(q_wc)
    pos = jnp.stack([x, jnp.full_like(x, y), z], axis=-1)
    t_cw = -quat_rotate(q_cw, pos)
    return jnp.concatenate([q_cw, t_cw], axis=-1)


def score_grid_localizability(scorer, m: MapState, spec,
                              headings: int = 8, cell_stride: int = 1):
    """Score every (stride-subsampled) grid cell at several headings.

    Returns counts [H', W', headings] (numpy) — the planner's
    feature-safety lookup.  One device call for the whole sweep.
    """
    zs = (np.arange(0, spec.height, cell_stride) + 0.5) \
        * spec.resolution + spec.origin_z
    xs = (np.arange(0, spec.width, cell_stride) + 0.5) \
        * spec.resolution + spec.origin_x
    hs = np.arange(headings) * (2 * np.pi / headings)
    X, Z, H = np.meshgrid(xs, zs, hs, indexing="ij")
    poses = pose_from_xz_heading(X.ravel(), Z.ravel(), H.ravel())
    counts = np.asarray(scorer(poses, m))
    return counts.reshape(len(xs), len(zs), headings).transpose(1, 0, 2)
