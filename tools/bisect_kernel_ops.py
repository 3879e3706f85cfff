"""Bisect which op in the tilewin v2 kernel kills the Mosaic compile.

Standalone one-op Pallas kernels at the real shapes. PROBES=csv selects.
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

    TB, M, Mp = 128, 16, 4
    sel = os.environ.get("PROBES", "").split(",") if os.environ.get("PROBES") \
        else None

    def run(name, fn, *args):
        if sel and name not in sel:
            return
        t0 = time.perf_counter()
        try:
            f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
            v = float(np.asarray(f(*args)))
            print(f"{name:14s} OK   {time.perf_counter()-t0:6.1f}s "
                  f"(chk {v:.3e})", flush=True)
        except Exception as e:
            print(f"{name:14s} FAIL {time.perf_counter()-t0:6.1f}s "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    rng = np.random.default_rng(0)
    win6 = jnp.asarray(rng.normal(size=(1, 3, Mp, TB, 16, 128))
                       .astype(np.float32).astype(jnp.bfloat16))
    x3 = jnp.asarray(rng.normal(size=(TB, M, 128)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(TB, M)).astype(np.float32))

    # 1. 6-D input block, plain copy-reduce
    def k_6d(w_ref, o_ref):
        acc = jnp.zeros((TB, 128), jnp.float32)
        for p in range(3):
            for g in range(Mp):
                acc = acc + w_ref[0, p, g].astype(jnp.float32).sum(axis=1)
        o_ref[:] = acc

    run("block6d", lambda w: pl.pallas_call(
        k_6d, out_shape=jax.ShapeDtypeStruct((TB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(w.shape, lambda: (0,) * 6,
                               memory_space=pltpu.VMEM)])(w), win6)

    # 2. concatenate along middle axis
    def k_cat(a_ref, o_ref):
        c = jnp.concatenate([a_ref[:], a_ref[:]], axis=1)   # (TB, 2M)
        o_ref[:] = c

    run("concat_mid", lambda a: pl.pallas_call(
        k_cat, out_shape=jax.ShapeDtypeStruct((TB, 2 * M), jnp.float32))(a),
        a2)

    # 3. leading-dims reshape merge (TB, M, 128) -> (TB*M, 128)
    def k_rs(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(TB * M, 128)

    run("reshape_lead", lambda x: pl.pallas_call(
        k_rs, out_shape=jax.ShapeDtypeStruct((TB * M, 128), jnp.float32))(x),
        x3)

    # 4. iota //, % with f32 compare at (TB, 2M, 16)
    def k_iota(a_ref, o_ref):
        sig = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 16), 2)
        tt = (sig // 2).astype(jnp.float32)
        par = (sig % 2).astype(jnp.float32)
        half = (jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 16), 1)
                // M).astype(jnp.float32)
        c = jnp.concatenate([a_ref[:], a_ref[:]], axis=1)[..., None]
        o_ref[:] = jnp.where(tt == c, 1.0, 0.0) * (par == half)

    run("iota_sepw", lambda a: pl.pallas_call(
        k_iota, out_shape=jax.ShapeDtypeStruct((TB, 2 * M, 16),
                                               jnp.float32))(a), a2)

    # 5. batched dot at kernel shape (TB batch, 2M, 16) @ (TB, 16, 128)
    A = jnp.asarray(rng.normal(size=(TB, 2 * M, 16)).astype(np.float32)
                    .astype(jnp.bfloat16))
    W = jnp.asarray(rng.normal(size=(TB, 16, 128)).astype(np.float32)
                    .astype(jnp.bfloat16))

    def k_dot(a_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], w_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run("dot_kshape", lambda a, w: pl.pallas_call(
        k_dot, out_shape=jax.ShapeDtypeStruct((TB, 2 * M, 128),
                                              jnp.float32))(a, w), A, W)

    # 6. sigmoid + running product on (TB, M)
    def k_sig(a_ref, o_ref):
        cw = jnp.ones((TB, M), jnp.float32)
        for _ in range(3):
            cw = cw * jax.nn.sigmoid(a_ref[:])
        o_ref[:] = cw

    run("sigmoid_prod", lambda a: pl.pallas_call(
        k_sig, out_shape=jax.ShapeDtypeStruct((TB, M), jnp.float32))(a), a2)

    # 7. multi-output pallas_call
    def k_multi(a_ref, o1_ref, o2_ref):
        o1_ref[:] = a_ref[:] * 2.0
        o2_ref[:] = a_ref[:] + 1.0

    def run_multi(a):
        o1, o2 = pl.pallas_call(
            k_multi, out_shape=[jax.ShapeDtypeStruct((TB, M), jnp.float32),
                                jax.ShapeDtypeStruct((TB, M), jnp.float32)])(a)
        return o1 + o2

    run("multi_out", run_multi, a2)

    # 8. grid + 6-D blockspec with index map (the real call pattern)
    U2 = 2 * TB
    win6g = jnp.asarray(rng.normal(size=(1, 3, Mp, U2, 16, 128))
                        .astype(np.float32).astype(jnp.bfloat16))

    def k_grid(w_ref, o_ref):
        o_ref[:] = w_ref[0, 0, 0].astype(jnp.float32).sum(axis=1)

    run("grid_6d", lambda w: pl.pallas_call(
        k_grid, grid=(1, U2 // TB),
        in_specs=[pl.BlockSpec((1, 3, Mp, TB, 16, 128),
                               lambda b, i: (b, 0, 0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, 128), lambda b, i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((U2, 128), jnp.float32))(w), win6g)


if __name__ == "__main__":
    main()
