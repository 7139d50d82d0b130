"""Measure async-dispatch pipelining behavior over the axon tunnel."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x @ x + 1)
    x = jnp.zeros((256, 256), jnp.float32)
    x = f(x)
    x.block_until_ready()

    # chained dispatches, one sync at the end
    for n in (1, 4, 16, 64):
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) * 1e3
        print(f"chain of {n:3d} dispatches + 1 sync: {dt:7.2f} ms "
              f"({dt/n:6.2f} ms/step)")

    # H2D enqueue cost without sync (overlap test)
    img = np.zeros((2, 480, 640), np.uint16)
    g = jax.jit(lambda p: p.astype(jnp.float32).sum())
    g(jax.device_put(img)).block_until_ready()
    t0 = time.perf_counter()
    outs = []
    for _ in range(16):
        outs.append(g(jax.device_put(img)))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"16 x (H2D 1.2MB + reduce) pipelined: {dt:7.2f} ms "
          f"({dt/16:6.2f} ms/frame)")

    # batched pull: many small arrays in one device_get
    small_outs = [f(x)[0, :8] for _ in range(8)]
    jax.block_until_ready(small_outs)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(small_outs)
    print(f"device_get of 8 small arrays: "
          f"{(time.perf_counter()-t0)/10*1e3:6.2f} ms")
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(small_outs[0])
    print(f"device_get of 1 small array:  "
          f"{(time.perf_counter()-t0)/10*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
