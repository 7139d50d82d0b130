"""Micro-profile of the pose-optimization LM iteration components."""
import time

import numpy as np


def timed(label, fn, *args, reps=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:52s} {dt*1e3:8.3f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/aos2_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from active_orb_slam2_tpu.geometry.projection import CameraParams
    from active_orb_slam2_tpu.geometry.se3 import se3_retract
    from active_orb_slam2_tpu.models.optimizer import (
        _edge_residual_jac, _edge_chi2, _huber_weight, inv_sigma2,
        pose_optimization, solve_spd)

    cam = CameraParams(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                       width=640, height=480)
    E = 1024
    key = jax.random.PRNGKey(0)
    pw = jax.random.normal(key, (E, 3)) * 2 + jnp.array([0, 0, 4.0])
    obs = jnp.concatenate([jax.random.uniform(key, (E, 2)) * 600,
                           jnp.zeros((E, 1))], axis=1)
    level = jnp.zeros((E,), jnp.int32)
    hs = jnp.zeros((E,), bool)
    ok = jnp.ones((E,), bool)
    pose = jnp.array([1., 0, 0, 0, 0, 0, 0])
    w_info = inv_sigma2(level)

    f_rj = jax.jit(lambda p: _edge_residual_jac(cam, p, pw, obs, hs))
    timed("residual+jac x1", f_rj, pose)

    def scanned(n):
        def body(p, _):
            r, Jp, _, zpos = _edge_residual_jac(cam, p, pw, obs, hs)
            c2 = _edge_chi2(r, w_info, hs)
            w = w_info * _huber_weight(c2, hs)
            w = jnp.where(ok & zpos, w, 0.0)
            H = jnp.einsum('eai,e,eaj->ij', Jp, w, Jp)
            b = -jnp.einsum('eai,e,ea->i', Jp, w, r)
            step = solve_spd(H + 1e-4 * jnp.diag(jnp.diagonal(H))
                             + 1e-9 * jnp.eye(6), b)
            return se3_retract(p, step), None
        return jax.jit(lambda p: jax.lax.scan(body, p, None, length=n)[0])

    timed("GN body scan x1", scanned(1), pose)
    timed("GN body scan x10", scanned(10), pose)
    timed("GN body scan x40", scanned(40), pose)

    f_solve = jax.jit(lambda H, b: solve_spd(H, b))
    H = jnp.eye(6) * 3.0
    b6 = jnp.ones((6,))
    timed("solve_spd 6x6 x1", f_solve, H, b6)

    def solve_chain(n):
        def body(x, _):
            return solve_spd(H + jnp.diag(x[:6] * 0 + 1e-3), x), None
        return jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0])
    timed("solve_spd chain x40", solve_chain(40), b6)

    def rj_chain(n):
        def body(p, _):
            r, Jp, _, _ = _edge_residual_jac(cam, p, pw, obs, hs)
            return se3_retract(p, Jp.mean((0, 1)) * 1e-6), None
        return jax.jit(lambda p: jax.lax.scan(body, p, None, length=n)[0])
    timed("residual+jac chain x40", rj_chain(40), pose)

    f_po = jax.jit(lambda p: pose_optimization(cam, p, pw, obs, level,
                                               hs, ok))
    timed("pose_optimization full", f_po, pose)

    from active_orb_slam2_tpu.ops.pose_opt_kernel import (
        pose_optimization_fused)
    f_pof = jax.jit(lambda p: pose_optimization_fused(
        cam, p, pw, obs, level, hs, ok))
    timed("pose_optimization FUSED pallas", f_pof, pose)


if __name__ == "__main__":
    main()
