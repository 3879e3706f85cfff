"""Probe the Mosaic ops the v5 coordinate-layout redesign needs.

The hat kernel ships coordinates as (…, M, 1) f32 — sublane-resident for
cheap lane-broadcast, but the trailing-1 minor dim costs 128x HBM tile
padding (~2.8 GB/chunk of padded coordinate traffic, PERF.md round 4).
The fix is to ship coords CLEAN ((…, M, U) with U minor, zero padding)
and relayout in-kernel. That needs, inside a kernel:

  swapT    (M, TB) -> (TB, M) swapaxes            (relay probe: 0.05 us)
  expand   (TB, M) -> (TB, M, 1) trailing-unit reshape
  bcast    hat(iota (TB, 2M, 128), x (TB, M) via concat + [:, :, None])
           — the full A4-construction dataflow from lane-resident coords

Each mode runs a tiny kernel and checks numerics vs numpy.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TB, M = 128, 16
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 7, (M, TB)).astype(np.float32)  # members x units
    xj = jnp.asarray(x)

    def run(mode):
        if mode == "swapT":
            def kern(x_ref, o_ref):
                o_ref[...] = jnp.swapaxes(x_ref[...], 0, 1)
            out_shape = jax.ShapeDtypeStruct((TB, M), jnp.float32)
            ref = x.T
        elif mode == "expand":
            def kern(x_ref, o_ref):
                xt = jnp.swapaxes(x_ref[...], 0, 1)       # (TB, M)
                o_ref[...] = xt[:, :, None] + jnp.zeros((TB, M, 128),
                                                        jnp.float32)
            out_shape = jax.ShapeDtypeStruct((TB, M, 128), jnp.float32)
            ref = np.broadcast_to(x.T[:, :, None], (TB, M, 128))
        elif mode == "bcast":
            def kern(x_ref, o_ref):
                xt = jnp.swapaxes(x_ref[...], 0, 1)       # (TB, M)
                xt2 = jnp.concatenate([xt, xt], axis=1)   # (TB, 2M)
                lam = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 2)
                tt = ((lam % 16) // 2).astype(jnp.float32)
                o_ref[...] = jnp.maximum(
                    0.0, 1.0 - jnp.abs(tt - xt2[:, :, None]))
            out_shape = jax.ShapeDtypeStruct((TB, 2 * M, 128), jnp.float32)
            lam = np.arange(128)
            tt = ((lam % 16) // 2).astype(np.float32)
            x2 = np.concatenate([x.T, x.T], axis=1)
            ref = np.maximum(0.0, 1.0 - np.abs(tt[None, None] - x2[..., None]))
        else:
            raise ValueError(mode)

        try:
            out = pl.pallas_call(
                kern, out_shape=out_shape,
                interpret=(jax.default_backend() != "tpu"))(xj)
            out = np.asarray(out)
            err = float(np.abs(out - ref).max())
            print(f"{mode:7s}: OK max|Δ|={err:.2e}", flush=True)
        except Exception as e:
            print(f"{mode:7s}: FAIL {type(e).__name__}: {str(e)[:250]}",
                  flush=True)

    for mode in ("swapT", "expand", "bcast"):
        run(mode)


if __name__ == "__main__":
    main()
