"""Mosaic primitive microbenchmarks for the tri-plane sampler v2 design.

Questions answered (on the real chip):
  1. one-hot windowed gather rate: (G, WIN) one-hot built in-kernel from
     local indices, matmul'd against a (WIN, 128) bf16 slab — static vs
     dynamic window base, various G/WIN.
  2. placement-matmul rate: (SLOTS, G) one-hot @ (G, 128) payload.
  3. pure MXU chain rate at these shapes (upper bound).

All hard-synced via host fetch.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def onehot_gather_kernel(loc_ref, w_ref, table_ref, out_ref, *, G, WIN, LANES,
                         dynamic_base, n_rows):
    i = pl.program_id(0)
    loc = loc_ref[0]          # (G, 2) int32 local row ids
    w = w_ref[0]              # (G, 2) f32 weights
    if dynamic_base:
        base = jnp.minimum(loc[0, 0], n_rows - WIN)
        base = pl.multiple_of((base // 512) * 512, 512)
        slab = table_ref[pl.ds(base, WIN), :]
        loc = loc - base
    else:
        slab = table_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (G, WIN), 1)
    oh = jnp.where(iota == loc[:, 0][:, None], w[:, 0][:, None], 0.0)
    oh = oh + jnp.where(iota == loc[:, 1][:, None], w[:, 1][:, None], 0.0)
    out_ref[0] = jnp.dot(oh.astype(jnp.bfloat16), slab,
                         preferred_element_type=jnp.float32)


def bench_onehot_gather(S, G, WIN, LANES, dynamic_base):
    rng = np.random.default_rng(0)
    n_rows = 196608 if dynamic_base else WIN
    n_tiles = S // G
    if dynamic_base:
        # sorted-ish stream: each group's rows within a WIN-row window
        bases = rng.integers(0, (n_rows - WIN) // 512, n_tiles) * 512
        loc = bases[:, None, None] + rng.integers(0, WIN - 8, (n_tiles, G, 2))
    else:
        loc = rng.integers(0, WIN - 8, (n_tiles, G, 2))
    loc = jnp.asarray(loc.astype(np.int32))
    w = jnp.asarray(rng.random((n_tiles, G, 2), dtype=np.float32))
    table = jnp.asarray(rng.random((n_rows, LANES), dtype=np.float32)).astype(jnp.bfloat16)

    kern = functools.partial(onehot_gather_kernel, G=G, WIN=WIN, LANES=LANES,
                             dynamic_base=dynamic_base, n_rows=n_rows)
    if dynamic_base:
        table_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        table_spec = pl.BlockSpec((WIN, LANES), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, G, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            table_spec,
        ],
        out_specs=pl.BlockSpec((1, G, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, G, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    try:
        t = timeit(jax.jit(f), loc, w, table)
    except Exception as e:
        print(f"  G={G} WIN={WIN} lanes={LANES} dyn={dynamic_base}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    flops = S * WIN * LANES * 2
    print(f"  G={G} WIN={WIN} lanes={LANES} dyn={int(dynamic_base)}: "
          f"{t*1e3:7.2f} ms  {S/t/1e6:8.1f} Msamp/s  {flops/t/1e12:6.1f} Tflop/s")


def matmul_chain_kernel(a_ref, b_ref, out_ref):
    out_ref[0] = jnp.dot(a_ref[0], b_ref[:], preferred_element_type=jnp.float32)


def bench_matmul_chain(n_tiles, M, K, N):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((n_tiles, M, K), dtype=np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.random((K, N), dtype=np.float32)).astype(jnp.bfloat16)
    f = pl.pallas_call(
        matmul_chain_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, M, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, M, N), jnp.float32),
    )
    t = timeit(jax.jit(f), a, b)
    flops = n_tiles * M * K * N * 2
    print(f"  chain ({M}x{K})@({K}x{N}) x{n_tiles}: {t*1e3:7.2f} ms  "
          f"{flops/t/1e12:6.1f} Tflop/s")


def main():
    print("devices:", jax.devices())
    S = 2_359_296 // 2  # half bench scale keeps runs quick

    print("one-hot gather, static window:")
    for G, WIN in ((512, 768), (256, 768), (512, 1536), (1024, 768), (512, 512)):
        bench_onehot_gather(S, G, WIN, 128, dynamic_base=False)
    print("one-hot gather, dynamic window base:")
    for G, WIN in ((512, 768), (1024, 1024)):
        bench_onehot_gather(S, G, WIN, 128, dynamic_base=True)
    print("raw MXU chains:")
    bench_matmul_chain(1024, 512, 768, 128)
    bench_matmul_chain(1024, 512, 256, 128)
    bench_matmul_chain(256, 1024, 1024, 128)


if __name__ == "__main__":
    main()
