"""Pallas fused pose-optimization kernel.

``Optimizer::PoseOptimization`` (~L230-380 [U]) runs 4 rounds x 10 LM
iterations over ~1k projection edges.  As an XLA scan each iteration
costs ~5 kernel launches (~40 us of launch overhead against ~2 us of
math), so the whole optimization burned ~2.6 ms x 2 calls per frame.
This kernel runs the ENTIRE optimization — all rounds, the inner damped
GN loop, chi2 reclassification — inside one Pallas program: edge data
lives in VMEM as flat [1, E] vectors (zero tile padding), the 6x6
normal equations accumulate through VPU reduces, and the solve/retract
is scalar math between vector passes.

Numerics match models/optimizer.py::pose_optimization: same damping
schedule, same chi2-carried accept/reject, same Huber deltas and
per-round reclassification (tested against it edge-for-edge).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from active_orb_slam2_tpu.geometry.projection import CameraParams
from active_orb_slam2_tpu.models.optimizer import (
    CHI2_MONO, CHI2_STEREO, PoseOptResult, solve_spd)


def _use_interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _quat_rotate_scalar(q, v):
    """Rotate scalar-or-vector triplet v by scalar quaternion q."""
    qw, qx, qy, qz = q
    vx, vy, vz = v
    # uv = q_vec x v;  out = v + 2*(qw*uv + q_vec x uv)
    uvx = qy * vz - qz * vy + qw * vx
    uvy = qz * vx - qx * vz + qw * vy
    uvz = qx * vy - qy * vx + qw * vz
    ox = vx + 2.0 * (qy * uvz - qz * uvy)
    oy = vy + 2.0 * (qz * uvx - qx * uvz)
    oz = vz + 2.0 * (qx * uvy - qy * uvx)
    return ox, oy, oz


def _so3_exp_scalar(wx, wy, wz):
    """Axis-angle -> quaternion (w, x, y, z), small-angle safe.

    Matches geometry/se3.py::_so3_exp (sin(t/2)/t series for small t).
    """
    t2 = wx * wx + wy * wy + wz * wz
    t = jnp.sqrt(t2)
    small = t < 1e-6
    half = 0.5 * t
    k = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(half) / jnp.maximum(t, 1e-20))
    qw = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(half))
    return qw, k * wx, k * wy, k * wz


def _left_jacobian_apply(wx, wy, wz, vx, vy, vz):
    """Jl(w) @ v with the same series as geometry/se3.py."""
    t2 = wx * wx + wy * wy + wz * wz
    t = jnp.sqrt(t2)
    small = t < 1e-6
    a = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(t)) / jnp.maximum(t2, 1e-20))
    b = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (t - jnp.sin(t)) / jnp.maximum(t2 * t, 1e-20))
    # W v = w x v;  W^2 v = w x (w x v)
    w1x = wy * vz - wz * vy
    w1y = wz * vx - wx * vz
    w1z = wx * vy - wy * vx
    w2x = wy * w1z - wz * w1y
    w2y = wz * w1x - wx * w1z
    w2z = wx * w1y - wy * w1x
    return (vx + a * w1x + b * w2x,
            vy + a * w1y + b * w2y,
            vz + a * w1z + b * w2z)


def _retract_scalar(pose, step):
    """exp(step) * pose on scalar tuples (q..., t...), matching
    geometry/se3.py::se3_retract (se3_exp with left-Jacobian trans)."""
    qw, qx, qy, qz, tx, ty, tz = pose
    dwx, dwy, dwz, dvx, dvy, dvz = step
    eqw, eqx, eqy, eqz = _so3_exp_scalar(dwx, dwy, dwz)
    etx, ety, etz = _left_jacobian_apply(dwx, dwy, dwz, dvx, dvy, dvz)
    nq = _quat_mul((eqw, eqx, eqy, eqz), (qw, qx, qy, qz))
    norm = jnp.sqrt(nq[0] ** 2 + nq[1] ** 2 + nq[2] ** 2 + nq[3] ** 2)
    inv = 1.0 / jnp.maximum(norm, 1e-12)
    rx, ry, rz = _quat_rotate_scalar((eqw, eqx, eqy, eqz), (tx, ty, tz))
    return (nq[0] * inv, nq[1] * inv, nq[2] * inv, nq[3] * inv,
            rx + etx, ry + ety, rz + etz)


def _build_kernel(cam: CameraParams, E: int, rounds: int,
                  iters_per_round: int):
    fx, fy, cx, cy, bf = (float(cam.fx), float(cam.fy), float(cam.cx),
                          float(cam.cy), float(cam.bf))

    def linearize(pose, pw, st):
        """pose scalars + pw rows [1,E] -> (r[3], J[3][6], c2, zpos)."""
        q = pose[:4]
        t = pose[4:]
        pcx, pcy, pcz = _quat_rotate_scalar(q, (pw[0], pw[1], pw[2]))
        pcx, pcy, pcz = pcx + t[0], pcy + t[1], pcz + t[2]
        zs = jnp.where(jnp.abs(pcz) < 1e-9, 1e-9, pcz)
        iz = 1.0 / zs
        iz2 = iz * iz
        u = fx * pcx * iz + cx
        v = fy * pcy * iz + cy
        ur = u - bf * iz
        r = [u - st["obs0"], v - st["obs1"],
             st["stf"] * (ur - st["obs2"])]
        zero = jnp.zeros_like(pcx)
        jpc = [
            [fx * iz, zero, -fx * pcx * iz2],
            [zero, fy * iz, -fy * pcy * iz2],
            [st["stf"] * fx * iz, zero,
             st["stf"] * (-fx * pcx * iz2 + bf * iz2)],
        ]
        px = [[zero, -pcz, pcy], [pcz, zero, -pcx], [-pcy, pcx, zero]]
        J = [[None] * 6 for _ in range(3)]
        for a in range(3):
            for i in range(3):
                J[a][i] = -(jpc[a][0] * px[0][i] + jpc[a][1] * px[1][i]
                            + jpc[a][2] * px[2][i])
                J[a][3 + i] = jpc[a][i]
        c2 = st["w_info"] * (r[0] * r[0] + r[1] * r[1] + r[2] * r[2])
        return r, J, c2, (pcz > 0).astype(jnp.float32)

    def kernel(pose_ref, pw_ref, obs_ref, aux_ref, out_ref, mask_ref):
        pw = [pw_ref[0:1, :], pw_ref[1:2, :], pw_ref[2:3, :]]
        st = {
            "obs0": obs_ref[0:1, :], "obs1": obs_ref[1:2, :],
            "obs2": obs_ref[2:3, :],
            "w_info": aux_ref[0:1, :], "stf": aux_ref[1:2, :],
            "valid": aux_ref[2:3, :], "chi2_th": aux_ref[3:4, :],
        }
        delta_h = jnp.sqrt(jnp.where(st["stf"] > 0, CHI2_STEREO, CHI2_MONO))
        pose = tuple(pose_ref[0, i] for i in range(7))
        inl = st["valid"]

        for rnd in range(rounds):
            use_huber = rnd < 2

            def body(_, carry):
                pose = carry[:7]
                best = carry[7:14]
                best_chi2, lam = carry[14], carry[15]
                r, J, c2, zpos = linearize(pose, pw, st)
                gate = inl * zpos
                chi2 = jnp.sum(c2 * gate)
                worse = chi2 > best_chi2
                lam = jnp.clip(jnp.where(worse, lam * 4.0, lam * 0.5),
                               1e-8, 1e2)
                best = tuple(jnp.where(worse, b, p)
                             for b, p in zip(best, pose))
                best_chi2 = jnp.minimum(chi2, best_chi2)
                if use_huber:
                    hub = jnp.minimum(
                        1.0, delta_h / jnp.sqrt(jnp.maximum(c2, 1e-12)))
                else:
                    hub = 1.0
                w = st["w_info"] * hub * gate
                # normal equations: 21 + 6 VPU reduces (in-kernel, no
                # launch overhead)
                Hl = [[None] * 6 for _ in range(6)]
                bl = [None] * 6
                for i in range(6):
                    for j in range(i + 1):
                        s = jnp.sum(w * (J[0][i] * J[0][j]
                                         + J[1][i] * J[1][j]
                                         + J[2][i] * J[2][j]))
                        Hl[i][j] = s
                        Hl[j][i] = s
                    bl[i] = -jnp.sum(w * (J[0][i] * r[0] + J[1][i] * r[1]
                                          + J[2][i] * r[2]))
                H = jnp.stack([jnp.stack(row) for row in Hl])
                b = jnp.stack(bl)
                step = solve_spd(
                    H + lam * jnp.diag(jnp.diagonal(H))
                    + 1e-9 * jnp.eye(6), b)
                new_pose = _retract_scalar(pose, tuple(step))
                new_pose = tuple(jnp.where(worse, b_, np_)
                                 for b_, np_ in zip(best, new_pose))
                return new_pose + best + (best_chi2, lam)

            init = pose + pose + (jnp.float32(jnp.inf), jnp.float32(1e-4))
            out = jax.lax.fori_loop(0, iters_per_round, body, init)
            cand, best, best_chi2 = out[:7], out[7:14], out[14]
            # final acceptance of the last proposed step
            _, _, c2c, zposc = linearize(cand, pw, st)
            cand_chi2 = jnp.sum(c2c * inl * zposc)
            better = cand_chi2 <= best_chi2
            pose = tuple(jnp.where(better, c, b)
                         for c, b in zip(cand, best))
            # chi2 reclassification for the next round
            _, _, c2r, zposr = linearize(pose, pw, st)
            inl = (st["valid"] * zposr
                   * (c2r <= st["chi2_th"]).astype(jnp.float32))

        _, _, c2f, _ = linearize(pose, pw, st)
        for i in range(7):
            out_ref[0, i] = pose[i]
        out_ref[0, 7] = jnp.sum(c2f * inl)
        mask_ref[0:1, :] = inl

    return kernel


@functools.lru_cache(maxsize=None)
def _pose_opt_call(cam_key, E: int, rounds: int, iters_per_round: int):
    cam = CameraParams(*cam_key)
    kernel = _build_kernel(cam, E, rounds, iters_per_round)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # pose [1, 8]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # pw [3, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # obs [3, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # aux [4, E]
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # pose+chi2 [1, 8]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # inlier mask [1, E]
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ],
        interpret=_use_interpret(),
    )


def pose_optimization_fused(cam: CameraParams, pose0, pw, obs_uvr, level,
                            has_stereo, valid,
                            rounds: int = 4, iters_per_round: int = 10
                            ) -> PoseOptResult:
    """Drop-in fused replacement for optimizer.pose_optimization."""
    from active_orb_slam2_tpu.models.optimizer import inv_sigma2
    E = pw.shape[0]
    w_info = inv_sigma2(level)
    chi2_th = jnp.where(has_stereo, CHI2_STEREO, CHI2_MONO)
    pose_in = jnp.concatenate([pose0, jnp.zeros((1,))]).reshape(1, 8)
    pw_t = pw.T.astype(jnp.float32)                        # [3, E]
    obs_t = obs_uvr.T.astype(jnp.float32)
    aux = jnp.stack([w_info, has_stereo.astype(jnp.float32),
                     valid.astype(jnp.float32), chi2_th])   # [4, E]
    cam_key = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
               cam.width, cam.height)
    out, mask = _pose_opt_call(cam_key, E, rounds, iters_per_round)(
        pose_in, pw_t, obs_t, aux)
    inliers = mask[0] > 0.5
    return PoseOptResult(pose=out[0, :7], inliers=inliers,
                         n_inliers=inliers.sum().astype(jnp.int32),
                         chi2=out[0, 7])
