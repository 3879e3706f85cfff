"""Probe full tilewin_combine compile variants on chip.

The full kernel's remote compile fails in a 'TpuAotCompiler (chipless)'
helper subprocess (libtpu init: no TPU_ACCELERATOR_TYPE) while every
single-op bisect probe (tools/bisect_kernel_ops.py) compiles in seconds
via the normal path. Variants isolate what flips the routing:
  V=novmem   drop compiler_params (vmem_limit_bytes)
  V=asis     the real pallas_call (default)
  V=warm     trivial pallas warmup first, then the real call
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from enarf_gan_tpu.ops.tilewin_kernel import (_combine_kernel, TB, M,
                                                  NTEX)

    variant = os.environ.get("V", "asis")
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
    valid = jnp.asarray((rng.random((B, Mp, U, M)) > 0.2).astype(np.float32))

    if variant == "warm":
        x = jnp.ones((128, 128), jnp.float32)
        y = pl.pallas_call(lambda xr, yr: yr.__setitem__(
            (...,), xr[...] * 2.0),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(x)
        print("warmup ok", float(np.asarray(y).sum()), flush=True)

    def im6(b, i):
        return (b, 0, 0, i, 0, 0)

    def im5(b, i):
        return (b, 0, 0, i, 0)

    def im4(b, i):
        return (b, 0, i, 0)

    spec5 = lambda w: pl.BlockSpec((1, 3, Mp, TB, w), im5,  # noqa: E731
                                   memory_space=pltpu.VMEM)
    kern = functools.partial(_combine_kernel, F=F, Mp=Mp,
                             clamp_mask=False, use_dot=True)
    kwargs = {}
    if variant != "novmem":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    call = pl.pallas_call(
        kern,
        grid=(B, U // TB),
        in_specs=[pl.BlockSpec((1, 3, Mp, TB, 16, 128), im6,
                               memory_space=pltpu.VMEM),
                  spec5(NTEX), spec5(M), spec5(M), spec5(M), spec5(M),
                  pl.BlockSpec((1, Mp, TB, M), im4,
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, TB, M, F), im4,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Mp, TB, M), im4,
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, U, M, F), jnp.float32),
                   jax.ShapeDtypeStruct((B, Mp, U, M), jnp.float32)],
        **kwargs)
    f = jax.jit(lambda *a: [x.sum() for x in call(*a)])
    t0 = time.perf_counter()
    try:
        out = f(win, mwin, dt, ds, fy, fx, valid)
        vals = [float(np.asarray(x)) for x in out]
        print(f"{variant}: OK {time.perf_counter()-t0:.1f}s chk={vals}",
              flush=True)
    except Exception as e:
        print(f"{variant}: FAIL {time.perf_counter()-t0:.1f}s "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
