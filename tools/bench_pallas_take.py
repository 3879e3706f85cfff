"""Can Mosaic gather from a VMEM-resident table inside a Pallas kernel?

Round-1 probes concluded `tpu.dynamic_gather` crashes the remote Mosaic
compiler, but they routed indices through SMEM (scalar-only). This re-probe
keeps indices in VMEM and tries the three plausible lowerings:

  a) jnp.take(table, idx, axis=0)           — row gather
  b) jnp.take_along_axis(..., axis=-1)      — lane gather
  c) one-hot MXU contraction (known-good)   — rate reference in-kernel

Run on the real chip: python tools/bench_pallas_take.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tools")
from tpu_timeit import timeit_amortized  # noqa: E402

R, L = 8192, 128
NIDX = 32768


def try_case(name, build, check):
    try:
        fn = jax.jit(build())
        out = fn()
        ok = check(np.asarray(out))
        if not ok:
            print(f"{name:24s}: WRONG RESULT")
            return
        s, _ = timeit_amortized(lambda x: build()(), jnp.zeros(()), iters=30)
        print(f"{name:24s}: OK  {NIDX/s/1e6:8.1f} Mrows/s")
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s}: FAIL {type(e).__name__}: {str(e)[:160]}")
    sys.stdout.flush()


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, L), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (NIDX,), 0, R, jnp.int32)
    ref = np.asarray(jnp.take(table, idx, axis=0), np.float32)

    # --- a) row gather, idx in VMEM (2-D to satisfy layout) ---
    idx2 = idx.reshape(NIDX // 128, 128)

    def kern_a(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:].reshape(-1)
        out_ref[:] = jnp.take(tab_ref[:], ix, axis=0)

    def build_a():
        def f(_):
            return pl.pallas_call(
                kern_a,
                out_shape=jax.ShapeDtypeStruct((NIDX, L), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx2, table)
        return lambda: f(0)

    try_case("a) take rows idx-VMEM", build_a,
             lambda o: np.allclose(o.astype(np.float32), ref))

    # --- a2) gathered rows immediately reduced (no big out) ---
    def kern_a2(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:].reshape(-1)
        g = jnp.take(tab_ref[:], ix, axis=0)
        out_ref[:] = g.astype(jnp.float32).sum(axis=0, keepdims=True)

    def build_a2():
        def f(_):
            return pl.pallas_call(
                kern_a2,
                out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx2, table)
        return lambda: f(0)

    try_case("a2) take rows + reduce", build_a2,
             lambda o: np.allclose(o.ravel(), ref.sum(axis=0), rtol=2e-2))

    # --- b) lane gather: per-row dynamic lane indices ---
    lane_idx = jax.random.randint(jax.random.PRNGKey(2), (256, L), 0, L,
                                  jnp.int32)
    small = jax.random.normal(key, (256, L), jnp.bfloat16)
    ref_b = np.take_along_axis(np.asarray(small, np.float32),
                               np.asarray(lane_idx), axis=-1)

    def kern_b(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=-1)

    def build_b():
        def f(_):
            return pl.pallas_call(
                kern_b,
                out_shape=jax.ShapeDtypeStruct((256, L), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(lane_idx, small)
        return lambda: f(0)

    try_case("b) lane take_along_axis", build_b,
             lambda o: np.allclose(o.astype(np.float32), ref_b))

    # --- c) in-kernel one-hot MXU gather over 512-row window ---
    widx = jax.random.randint(jax.random.PRNGKey(3), (NIDX,), 0, 512,
                              jnp.int32).reshape(NIDX // 128, 128)

    def kern_c(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:].reshape(-1, 1)
        oh = (ix == jax.lax.broadcasted_iota(
            jnp.int32, (NIDX, 512), 1)).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(oh, tab_ref[0:512, :],
                             preferred_element_type=jnp.float32)

    def build_c():
        def f(_):
            return pl.pallas_call(
                kern_c,
                out_shape=jax.ShapeDtypeStruct((NIDX, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(widx, table)
        return lambda: f(0)

    ref_c = np.asarray(jnp.take(table, widx.reshape(-1), axis=0), np.float32)
    try_case("c) onehot-512 MXU", build_c,
             lambda o: np.allclose(o, ref_c, rtol=2e-2, atol=1e-2))


if __name__ == "__main__":
    main()
