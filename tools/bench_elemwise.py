"""Isolate the elementwise-op slowness: same data volume, different shapes."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE = None


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return max((time.perf_counter() - t0) / iters - (BASELINE or 0), 1e-9)


def main():
    global BASELINE
    key = jax.random.PRNGKey(0)

    @jax.jit
    def null(x):
        return x.sum()

    BASELINE = timed(null, jnp.ones((8, 128)), iters=5)
    print(f"baseline: {BASELINE*1e3:.1f} ms")

    n = 196608
    total = 23 * 3 * n  # ~13.6M elements

    shapes = [
        (1, 23, 3, n),
        (23, 3, n),
        (69, n),
        (23 * 3 * n // 128, 128),
        (n, 69),
        (1, 23, n, 3),
    ]
    for shp in shapes:
        x = jax.random.normal(key, shp, jnp.float32)

        @jax.jit
        def f(x):
            return (x * 2.0 + 1.0).sum()

        s = timed(f, x)
        print(f"elemwise mul-add {str(shp):24s}: {s*1e3:8.2f} ms "
              f"-> {total/s/1e9:7.2f} Gel/s")

    # broadcasting pattern from the transform
    pts = jax.random.normal(key, (1, 3, n), jnp.float32)
    t = jax.random.normal(key, (1, 23, 3, 1), jnp.float32)

    @jax.jit
    def bcast(p, t):
        return (p[:, None] - t).sum()

    s = timed(bcast, pts, t)
    print(f"broadcast (1,3,n)-(1,23,3,1): {s*1e3:8.2f} ms -> {total/s/1e9:7.2f} Gel/s")

    # n-minor with K*3 folded into sublanes-friendly leading dim, abs+cmp
    x = jax.random.normal(key, (69, n), jnp.float32)

    @jax.jit
    def abscmp(x):
        return ((jnp.abs(x) <= 1).sum())

    s = timed(abscmp, x)
    print(f"abs+cmp (69,n): {s*1e3:8.2f} ms -> {total/s/1e9:7.2f} Gel/s")

    # reduce over tiny middle axis (the .all(axis=2) pattern)
    x4 = jax.random.normal(key, (1, 23, 3, n), jnp.float32)

    @jax.jit
    def redmid(x):
        return (jnp.abs(x) <= 1).all(axis=2).sum()

    s = timed(redmid, x4)
    print(f"all(axis=2) on (1,23,3,n): {s*1e3:8.2f} ms -> {total/s/1e9:7.2f} Gel/s")

    # float vs int compare-heavy mix on 2D
    @jax.jit
    def mixed(x):
        y = jnp.floor(x * 128.0)
        z = jnp.clip(y, 0, 255).astype(jnp.int32)
        return (z * 257 + 3).sum()

    s = timed(mixed, x)
    print(f"floor/clip/int math (69,n): {s*1e3:8.2f} ms -> {total/s/1e9:7.2f} Gel/s")

    # big elementwise: 512MB tensor
    big = jax.random.normal(key, (4096, 32768), jnp.float32)

    @jax.jit
    def f2(x):
        return (x * 2.0 + 1.0).sum()

    s = timed(f2, big)
    print(f"elemwise (4096,32768) 512MB: {s*1e3:8.2f} ms -> "
          f"{big.size/s/1e9:7.2f} Gel/s ({big.size*4*2/s/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
