"""Bisect which v4 (hat) kernel construct fails the Mosaic compile.

Standalone one-construct Pallas kernels at real shapes; PROBES=csv.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TB, M, F, NTEX = 64, 16, 32, 64
    f32 = jnp.float32
    sel = os.environ.get("PROBES", "").split(",") \
        if os.environ.get("PROBES") else None

    def run(name, kern, ins, outs, in_specs, out_specs, grid):
        if sel and name not in sel:
            return
        t0 = time.perf_counter()
        try:
            fn = pl.pallas_call(kern, grid=grid, in_specs=in_specs,
                                out_specs=out_specs, out_shape=outs)
            r = jax.jit(lambda *a: sum(x.astype(f32).sum()
                                       for x in jax.tree_util.tree_leaves(
                                           fn(*a))))(*ins)
            v = float(np.asarray(r))
            print(f"{name:12s} OK {time.perf_counter()-t0:6.1f}s  "
                  f"checksum {v:.3e}", flush=True)
        except Exception as e:
            print(f"{name:12s} FAIL {time.perf_counter()-t0:6.1f}s "
                  f"{type(e).__name__}: {str(e)[:500]}", flush=True)

    U = 256
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.random((U, M, 1)).astype(np.float32) * 6)
    win = jnp.asarray(rng.normal(size=(U, 16, 128)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    vmem = pltpu.VMEM

    spec_c = pl.BlockSpec((TB, M, 1), lambda i: (i, 0, 0),
                          memory_space=vmem)
    spec_w = pl.BlockSpec((TB, 16, 128), lambda i: (i, 0, 0),
                          memory_space=vmem)
    out_mf = jax.ShapeDtypeStruct((U, M, F), f32)
    spec_mf = pl.BlockSpec((TB, M, F), lambda i: (i, 0, 0),
                           memory_space=vmem)
    out_m1 = jax.ShapeDtypeStruct((U, M, 1), f32)
    spec_m1 = pl.BlockSpec((TB, M, 1), lambda i: (i, 0, 0),
                           memory_space=vmem)
    grid = (U // TB,)

    # 1: load (TB, M, 1) coord block, write it back
    def k_load(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    run("load_c", k_load, [xt], out_m1, [spec_c], spec_m1, grid)

    # 2: broadcast (TB,M,1) against a (TB,M,128) iota -> hat -> reduce
    def k_hat(x_ref, o_ref):
        i = jax.lax.broadcasted_iota(jnp.int32, (TB, M, 128), 2).astype(f32)
        h = jnp.maximum(0.0, 1.0 - jnp.abs(i - x_ref[...]))
        o_ref[...] = h.sum(axis=-1, keepdims=True)

    run("hat_bcast", k_hat, [xt], out_m1, [spec_c], spec_m1, grid)

    # 3: concat (TB,M,1)+(TB,M,1) on axis 1 -> (TB,2M,1) -> reduce
    def k_cat(x_ref, o_ref):
        x2 = jnp.concatenate([x_ref[...], x_ref[...]], axis=1)
        o_ref[...] = x2[:, :M] + x2[:, M:]

    run("cat_sub", k_cat, [xt], out_m1, [spec_c], spec_m1, grid)

    # 4: 32-lane static slices of a (TB,2M,128) value
    def k_slice(w_ref, x_ref, o_ref):
        d = w_ref[...].astype(f32)
        d2 = jnp.concatenate([d, d], axis=1)            # (TB, 32, 128)
        acc = jnp.zeros((TB, M, F), f32)
        d0 = jax.lax.slice_in_dim(d2, 0, M, axis=1)
        for qq in range(4):
            dq = jax.lax.slice_in_dim(d0, qq * F, (qq + 1) * F, axis=2)
            acc = acc + dq * (x_ref[...] + qq)
        o_ref[...] = acc

    run("lane_slice", k_slice, [win, xt], out_mf, [spec_w, spec_c],
        spec_mf, grid)

    # 5: bdiag dot with (TB,2M,1)-built weights
    def k_dot(w_ref, x_ref, o_ref):
        lam = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 2)
        uu = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 0) % 8
        hh = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 1) // M
        sig = lam % 16
        umask = ((lam // 16 == uu) & (sig % 2 == hh)).astype(f32)
        tt = (sig // 2).astype(f32)
        xt2 = jnp.concatenate([x_ref[...], x_ref[...]], axis=1)
        A4 = jnp.maximum(0.0, 1.0 - jnp.abs(tt - xt2)) * umask
        Ab = A4.astype(jnp.bfloat16).reshape(TB // 8, 8 * 2 * M, 128)
        Wb = w_ref[...].reshape(TB // 8, 8 * 16, 128)
        D = jax.lax.dot_general(
            Ab, Wb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).reshape(TB, 2 * M, 128)
        D0 = jax.lax.slice_in_dim(D, 0, M, axis=1)
        o_ref[...] = jax.lax.slice_in_dim(D0, 0, F, axis=2)

    run("bdiag_dot", k_dot, [win, xt], out_mf, [spec_w, spec_c],
        spec_mf, grid)

    # 6: mask-window product with (TB,M,1) coords
    def k_mask(x_ref, o_ref):
        wt_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                // 8).astype(f32)
        ws_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                % 8).astype(f32)
        x = x_ref[...]
        wl = jnp.maximum(0.0, 1.0 - jnp.abs(wt_i - x)) \
            * jnp.maximum(0.0, 1.0 - jnp.abs(ws_i - x))
        o_ref[...] = wl.sum(axis=-1, keepdims=True)

    run("mask_hat", k_mask, [xt], out_m1, [spec_c], spec_m1, grid)


if __name__ == "__main__":
    main()
