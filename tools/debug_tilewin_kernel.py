"""Bisect Mosaic compile failures in ops/tilewin_kernel.py on the chip.

Compiles tilewin_combine at one-block shapes (B=1, U=TB) with kernel
stages progressively enabled via ENARF_TILEWIN_DEBUG_STAGE:
  full (default) | nodot (ENARF_TILEWIN_KERNEL=vpu) | ...
Prints the full Mosaic error. Small shapes -> seconds-scale compiles.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    from enarf_gan_tpu.ops.tilewin_kernel import tilewin_combine, TB, M, NTEX

    B, Mp, U, F = 1, 4, TB, 32
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(B, 3, Mp, U, 16, 128))
                      .astype(np.float32).astype(jnp.bfloat16))
    mwin = jnp.asarray(rng.normal(size=(B, 3, Mp, U, NTEX))
                       .astype(np.float32).astype(jnp.bfloat16))
    dt = jnp.asarray(rng.integers(0, 7, (B, 3, Mp, U, M)).astype(np.float32))
    ds = jnp.asarray(rng.integers(0, 7, (B, 3, Mp, U, M)).astype(np.float32))
    fy = jnp.asarray(rng.random((B, 3, Mp, U, M)).astype(np.float32))
    fx = jnp.asarray(rng.random((B, 3, Mp, U, M)).astype(np.float32))
    valid = jnp.asarray((rng.random((B, Mp, U, M)) > 0.2)
                        .astype(np.float32))

    f = jax.jit(lambda *a: [x.sum() for x in
                            tilewin_combine(*a, F, clamp_mask=False)])
    t0 = time.perf_counter()
    try:
        out = f(win, mwin, dt, ds, fy, fx, valid)
        vals = [float(np.asarray(x)) for x in out]
        print(f"OK compile+run {time.perf_counter()-t0:.1f}s chk={vals}")
        # correctness vs interpret mode
        fi = jax.jit(lambda *a: tilewin_combine(*a, F, clamp_mask=False,
                                                interpret=True))
        ref = fi(win, mwin, dt, ds, fy, fx, valid)
        got = jax.jit(lambda *a: tilewin_combine(*a, F, clamp_mask=False))(
            win, mwin, dt, ds, fy, fx, valid)
        for name, r, g in zip(("feat", "candw"), ref, got):
            d = float(jnp.max(jnp.abs(r - g)))
            print(f"  max|Δ| {name} = {d:.3e}")
    except Exception as e:
        print(f"FAIL after {time.perf_counter()-t0:.1f}s: "
              f"{type(e).__name__}:")
        print(str(e)[:4000])


if __name__ == "__main__":
    main()
