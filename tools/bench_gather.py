"""Microbenchmark gather/sort/scatter formulations on the real TPU chip.

Measures the primitives the tri-plane sampler could be built from, each
hard-synced (np.asarray fetch of a small reduction) and amortized over an
in-graph fori_loop to hide dispatch overhead (the remote runtime's
block_until_ready does not reliably fence — PERF.md).

Run: python tools/bench_gather.py [--quick]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timed(fn, *args, iters=3):
    """Compile, warm up, then time `iters` calls with hard host sync."""
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from functools import partial

    quick = "--quick" in sys.argv
    LOOP = 4          # in-graph repetitions (data-dependent chaining)
    N_IDX = 2**20 if quick else 2**22   # gathers per in-graph rep
    R = 196608        # 3 * 256 * 256 rows
    L = 128           # lanes

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N_IDX,), 0, R, jnp.int32)
    idx_sorted = jnp.sort(idx)

    def report(name, secs, n, unit="rows"):
        print(f"{name:46s} {secs*1e3:9.2f} ms  -> {n/secs/1e6:10.1f} M{unit}/s")

    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        table = jax.random.normal(key, (R, L), dtype)

        @jax.jit
        def take_rows(t, ix):
            def body(i, acc):
                g = jnp.take(t, ix + i, axis=0)
                return acc + g.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, LOOP, body, 0.0)

        s = timed(take_rows, table, idx)
        report(f"XLA take rows ({dname}, {L} lanes, random)", s, N_IDX * LOOP)
        s = timed(take_rows, table, idx_sorted)
        report(f"XLA take rows ({dname}, {L} lanes, sorted)", s, N_IDX * LOOP)

    # narrow rows (32 lanes)
    table32 = jax.random.normal(key, (R, 32), jnp.float32)

    @jax.jit
    def take_rows32(t, ix):
        def body(i, acc):
            g = jnp.take(t, ix + i, axis=0)
            return acc + g.sum()
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    s = timed(take_rows32, table32, idx)
    report("XLA take rows (f32, 32 lanes, random)", s, N_IDX * LOOP)

    # sort: int32 keys alone and with one payload
    @jax.jit
    def sort_keys(ix):
        def body(i, acc):
            return acc + jnp.sort(ix + i)[0]
        return jax.lax.fori_loop(0, LOOP, body, 0)

    s = timed(sort_keys, idx)
    report(f"XLA sort int32 keys (n={N_IDX})", s, N_IDX * LOOP, "keys")

    payload = jnp.arange(N_IDX, dtype=jnp.int32)

    @jax.jit
    def sort_kv(ix, pv):
        def body(i, acc):
            k, v = jax.lax.sort((ix + i, pv), num_keys=1)
            return acc + k[0] + v[0]
        return jax.lax.fori_loop(0, LOOP, body, 0)

    s = timed(sort_kv, idx, payload)
    report(f"XLA sort int32 k+v (n={N_IDX})", s, N_IDX * LOOP, "keys")

    # argsort-free rank: cumsum-based counting for 384 buckets
    tiles = idx // 512  # 384 tiles

    @jax.jit
    def onehot_hist(tz):
        def body(i, acc):
            oh = jax.nn.one_hot(tz + i - i, 384, dtype=jnp.float32)
            return acc + oh.sum(0)
        return jax.lax.fori_loop(0, LOOP, body, jnp.zeros(384))

    s = timed(onehot_hist, tiles)
    report("one-hot histogram 384 buckets", s, N_IDX * LOOP, "keys")

    # scatter-add rows (VJP shape): 1M rows of 128 into (R,128)
    vals = jax.random.normal(key, (N_IDX, L), jnp.float32)

    @jax.jit
    def scatter_add(ix, v):
        def body(i, acc):
            return acc.at[ix + i].add(v)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros((R + LOOP, L), jnp.float32))

    s = timed(scatter_add, idx, vals)
    report("XLA scatter-add rows (f32, 128 lanes)", s, N_IDX * LOOP)

    # segment-sum with sorted ids
    @jax.jit
    def seg_sum(ix, v):
        def body(i, acc):
            return acc + jax.ops.segment_sum(
                v, ix + i, num_segments=R + LOOP,
                indices_are_sorted=True)[:R]
        return jax.lax.fori_loop(0, LOOP, body, jnp.zeros((R, L)))

    s = timed(seg_sum, idx_sorted, vals)
    report("segment_sum sorted (f32, 128 lanes)", s, N_IDX * LOOP)

    # ---- Pallas: tpu.dynamic_gather via take_along_axis in a kernel ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for TH in (512, 2048, 8192, 32768, 196608):
        # gather N_BLK rows from a (TH, L) VMEM-resident table per grid step
        N_BLK = 1024
        n_blocks = max(1, (N_IDX // 4) // N_BLK)
        bidx = jax.random.randint(key, (n_blocks * N_BLK, L), 0, TH, jnp.int32)
        btab = jax.random.normal(key, (TH, L), jnp.float32)

        def dg_kernel(tab_ref, idx_ref, out_ref):
            # out[i, l] = tab[idx[i, l], l]
            out_ref[:] = jnp.take_along_axis(
                jnp.pad(tab_ref[:], ((0, N_BLK - TH), (0, 0)))
                if TH < N_BLK else tab_ref[:],
                idx_ref[:], axis=0)[:N_BLK]

        try:
            f = pl.pallas_call(
                dg_kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((TH, L), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N_BLK, L), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((N_BLK, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_blocks * N_BLK, L),
                                               jnp.float32),
            )
            jf = jax.jit(lambda t, ix: f(t, ix).sum())
            s = timed(jf, btab, bidx)
            report(f"pallas dynamic_gather tableH={TH}", s, n_blocks * N_BLK)
        except Exception as e:  # noqa
            print(f"pallas dynamic_gather tableH={TH}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}")

    # ---- one-hot matmul gather: 512-row tile, 512 samples/block ----
    TILE, BLK = 512, 512
    n_blocks = (N_IDX // 4) // BLK
    tidx = jax.random.randint(key, (n_blocks, BLK), 0, TILE, jnp.int32)
    ttab = jax.random.normal(key, (TILE, L), jnp.bfloat16)

    @jax.jit
    def onehot_gather(t, ix):
        def blk(carry, ib):
            oh = jax.nn.one_hot(ib, TILE, dtype=jnp.bfloat16)
            g = jnp.dot(oh, t, preferred_element_type=jnp.float32)
            return carry + g.sum(), None
        acc, _ = jax.lax.scan(blk, 0.0, ix)
        return acc

    s = timed(onehot_gather, ttab, tidx)
    report("XLA one-hot matmul gather (tile 512)", s, n_blocks * BLK)


if __name__ == "__main__":
    main()
