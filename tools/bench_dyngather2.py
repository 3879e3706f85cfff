"""Round 2 of primitive probes: subtract the ~25 ms host-fetch latency by
making every measured op big enough to dominate, and report net times.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASELINE = None


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t = (time.perf_counter() - t0) / iters
    return t if BASELINE is None else max(t - BASELINE, 1e-9)


def main():
    global BASELINE
    key = jax.random.PRNGKey(0)

    @jax.jit
    def null(x):
        return x.sum()

    BASELINE = None
    BASELINE = timed(null, jnp.ones((8, 128)), iters=5)
    print(f"host round-trip baseline: {BASELINE*1e3:.1f} ms")
    sys.stdout.flush()

    # --- XLA take rows, large: 4M idx x LOOP=16 = 64M rows ---
    R, L = 196608, 128
    N_IDX = 2**22
    LOOP = 16
    idx = jax.random.randint(key, (N_IDX,), 0, R - LOOP, jnp.int32)
    for dtype, dname in ((jnp.bfloat16, "bf16"),):
        table = jax.random.normal(key, (R, L), dtype)

        @jax.jit
        def take_rows(t, ix):
            def body(i, acc):
                g = jnp.take(t, ix + i, axis=0)
                return acc + g.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, LOOP, body, 0.0)

        s = timed(take_rows, table, idx)
        print(f"take rows {dname} net: {s*1e3:9.2f} ms -> "
              f"{N_IDX*LOOP/s/1e6:8.1f} Mrows/s")
        sys.stdout.flush()

    # --- sort, large ---
    LOOP_S = 16

    @jax.jit
    def sort_kv(ix, pv):
        def body(i, acc):
            k, v = jax.lax.sort((ix + i, pv), num_keys=1)
            return acc + k[0] + v[0]
        return jax.lax.fori_loop(0, LOOP_S, body, 0)

    payload = jnp.arange(N_IDX, dtype=jnp.int32)
    s = timed(sort_kv, idx, payload)
    print(f"sort int32 k+v net: {s*1e3:9.2f} ms -> "
          f"{N_IDX*LOOP_S/s/1e6:8.1f} Mkeys/s")
    sys.stdout.flush()

    # --- one-hot einsum gather, large: NB*BLK = 4M rows ---
    for TILE in (128, 256, 512):
        NB, BLK = 8192, 512
        ixb = jax.random.randint(key, (NB, BLK), 0, TILE, jnp.int32)
        tab = jax.random.normal(key, (TILE, L), jnp.bfloat16)

        @jax.jit
        def f(t, ixb):
            oh = jax.nn.one_hot(ixb, TILE, dtype=jnp.bfloat16)
            g = jnp.einsum("nbt,tl->nbl", oh, t,
                           preferred_element_type=jnp.float32)
            return g.sum()

        s = timed(f, tab, ixb)
        print(f"onehot einsum TILE={TILE}: net {s*1e3:9.2f} ms -> "
              f"{NB*BLK/s/1e6:8.1f} Mrows/s")
        sys.stdout.flush()

    # --- pallas one-hot gather from VMEM-resident big table, sorted-tile ---
    # samples pre-grouped: block j reads tile (j % n_tiles); table resident.
    TILE, BLK = 512, 512
    NBLK = 8192  # 4M rows
    n_tiles = R // TILE
    tile_of_block = jax.random.randint(key, (NBLK,), 0, n_tiles, jnp.int32)
    loc = jax.random.randint(key, (NBLK, BLK), 0, TILE, jnp.int32)
    tabf = jax.random.normal(key, (R, L), jnp.bfloat16)

    def kernel(tile_ref, loc_ref, tab_ref, out_ref):
        lc = loc_ref[:]  # (BLK,)  int32
        oh = (lc[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (BLK, TILE), 1)
              ).astype(jnp.bfloat16)
        t0 = tile_ref[0]
        window = tab_ref[pl.ds(t0 * TILE, TILE), :]
        out_ref[:] = jnp.dot(oh, window, preferred_element_type=jnp.float32)

    try:
        f = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NBLK,),
                in_specs=[
                    pl.BlockSpec((NBLK, BLK), lambda i, t: (0, 0),
                                 memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((BLK, L), lambda i, t: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NBLK * BLK, L), jnp.float32),
        )
        print("NOTE: ANY-space variant; may fail")
    except Exception as e:
        print(f"pallas sorted-tile build failed: {e}")

    # simpler: tile window via input BlockSpec index_map from prefetched scalars
    def kernel2(tile_ref, loc_ref, win_ref, out_ref):
        lc = loc_ref[:].reshape(BLK)
        oh = (lc[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (BLK, TILE), 1)
              ).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(oh, win_ref[:],
                             preferred_element_type=jnp.float32)

    try:
        f2 = pl.pallas_call(
            kernel2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NBLK,),
                in_specs=[
                    pl.BlockSpec((1, BLK), lambda i, t: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, L), lambda i, t: (t[i], 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, L), lambda i, t: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NBLK * BLK, L), jnp.float32),
        )
        jf2 = jax.jit(lambda t, lc, tb: f2(t, lc, tb).sum())
        s = timed(jf2, tile_of_block, loc.reshape(NBLK, 1, BLK)[:, 0, :],
                  tabf)
        print(f"pallas sorted-tile onehot (tile {TILE}): net {s*1e3:9.2f} ms "
              f"-> {NBLK*BLK/s/1e6:8.1f} Mrows/s")
    except Exception as e:
        print(f"pallas sorted-tile v2 failed: {type(e).__name__}: {str(e)[:300]}")
    sys.stdout.flush()

    # --- minimal dynamic_gather repro (one op, small) ---
    N = 512

    def dg_kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    try:
        f3 = pl.pallas_call(
            dg_kernel,
            in_specs=[pl.BlockSpec((N, L), memory_space=pltpu.VMEM),
                      pl.BlockSpec((N, L), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, L), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, L), jnp.float32),
        )
        tab = jax.random.normal(key, (N, L), jnp.float32)
        ixg = jax.random.randint(key, (N, L), 0, N, jnp.int32)
        r = jax.jit(f3)(tab, ixg)
        ok = np.allclose(np.asarray(r),
                         np.take_along_axis(np.asarray(tab), np.asarray(ixg), 0))
        print(f"dynamic_gather minimal (512x128 f32): compiles, correct={ok}")
    except Exception as e:
        print(f"dynamic_gather minimal: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
