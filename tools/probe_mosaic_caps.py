"""Probe Mosaic capabilities that decide the tilewin kernel-v2 design.

Each probe compiles + runs a minimal Pallas kernel on the real chip and
prints OK/FAIL + a rough amortized time. Probes (env PROBES=csv to select):

  reshape_fm   in-kernel minor split (TB,2048)->(TB,32,64) [feature-major]
  reshape_tm   in-kernel minor split (TB,2048)->(TB,64,32) [texel-major]
  gather_sub   in-kernel jnp.take(table,(n,),axis=0) sublane dynamic gather
  dot_batched  jax.lax.dot_general with a batch dim
  ewr          elementwise multiply-broadcast + lane reduce (TS formulation)

AXON SAFETY: serialized scalar-out calls only (see tools/tpu_timeit.py).
"""
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
    import time

    sel = os.environ.get("PROBES", "").split(",") if os.environ.get("PROBES") \
        else None
    TB = 128

    def run(name, fn, *args):
        if sel and name not in sel:
            return
        try:
            f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
            t0 = time.perf_counter()
            v = float(np.asarray(f(*args)))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(5):
                float(np.asarray(f(*args)))
            t = (time.perf_counter() - t0) / 5
            print(f"{name:12s} OK   compile {tc:6.1f}s  call {t*1e3:7.2f} ms"
                  f"  (chk {v:.3e})", flush=True)
        except Exception as e:
            print(f"{name:12s} FAIL {type(e).__name__}: {str(e)[:240]}",
                  flush=True)

    rng = np.random.default_rng(0)
    x2048 = jnp.asarray(rng.normal(size=(TB, 2048)).astype(np.float32)
                        .astype(jnp.bfloat16))

    # --- in-kernel minor split reshapes ---
    def k_reshape_fm(x_ref, o_ref):
        v = x_ref[:].reshape(TB, 32, 64).astype(jnp.float32)
        o_ref[:] = v.sum(axis=-1)

    def k_reshape_tm(x_ref, o_ref):
        v = x_ref[:].reshape(TB, 64, 32).astype(jnp.float32)
        o_ref[:] = v.sum(axis=-2)

    for name, k in [("reshape_fm", k_reshape_fm), ("reshape_tm", k_reshape_tm)]:
        run(name, lambda x, k=k: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((TB, 32), jnp.float32))(x), x2048)

    # --- sublane dynamic gather from a VMEM table ---
    table = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, (1024,)).astype(np.int32))

    def k_gather(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    run("gather_sub", lambda t, i: pl.pallas_call(
        k_gather, out_shape=jax.ShapeDtypeStruct((1024, 256), jnp.float32))(
            t, i), table, idx)

    # gather with 2-D index array (per-row texel select), axis 0
    idx2 = jnp.asarray(rng.integers(0, 512, (8, 128)).astype(np.int32))

    def k_gather2(t_ref, i_ref, o_ref):
        # per-lane gather: out[s, l] = t[i[s, l], l]
        o_ref[:] = jnp.take_along_axis(t_ref[:128], i_ref[:] % 128, axis=0)

    run("gather_lane", lambda t, i: pl.pallas_call(
        k_gather2, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(
            t, i), table, idx2)

    # --- batched dot_general ---
    a = jnp.asarray(rng.normal(size=(16, 128, 64)).astype(np.float32)
                    .astype(jnp.bfloat16))
    b = jnp.asarray(rng.normal(size=(16, 64, 128)).astype(np.float32)
                    .astype(jnp.bfloat16))

    def k_dotb(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run("dot_batched", lambda a, b: pl.pallas_call(
        k_dotb, out_shape=jax.ShapeDtypeStruct((16, 128, 128), jnp.float32))(
            a, b), a, b)

    # --- TS-formulation combine micro: (TB,16,1,64)*(TB,1,32,64) sum(-1) ---
    w = jnp.asarray(rng.normal(size=(TB, 16, 64)).astype(np.float32)
                    .astype(jnp.bfloat16))
    win = jnp.asarray(rng.normal(size=(TB, 32, 64)).astype(np.float32)
                      .astype(jnp.bfloat16))

    def k_ewr(w_ref, win_ref, o_ref):
        ww = w_ref[:].astype(jnp.float32)
        vv = win_ref[:].astype(jnp.float32)
        o_ref[:] = (ww[:, :, None, :] * vv[:, None, :, :]).sum(axis=-1)

    run("ewr", lambda w, v: pl.pallas_call(
        k_ewr, out_shape=jax.ShapeDtypeStruct((TB, 16, 32), jnp.float32))(
            w, v), w, win)


if __name__ == "__main__":
    main()
