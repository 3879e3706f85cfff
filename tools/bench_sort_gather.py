"""Primitive benchmarks for the tri-plane gather redesign (round 2).

Measures, on the real chip, everything the sorted-stream sampler design
depends on:
  * jax.lax.sort / sort_key_val cost at bench scale (S ~ 2.4M) with payloads
  * XLA row-gather (take) and flat scalar gather rates (round-1 sanity)
  * one-hot windowed matmul throughput on an already-sorted stream
  * segment_sum with sorted segment ids (output-side reduction)

All timings hard-sync via host fetch (block_until_ready is unreliable on
the remote runtime — PERF.md round 1).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    R = 196608  # 3 * 256 * 256 table rows
    F2 = 64

    for S in (1 << 20, 2_359_296, 1 << 22):
        keys = jnp.asarray(rng.integers(0, R, S, dtype=np.int32))
        pay1 = jnp.asarray(rng.integers(0, S, S, dtype=np.int32))
        payf = [jnp.asarray(rng.random(S, dtype=np.float32)) for _ in range(4)]

        t = timeit(jax.jit(lambda k: jax.lax.sort(k)), keys)
        print(f"S={S}: sort key only            {t*1e3:8.2f} ms  ({S/t/1e6:7.1f} M/s)")

        t = timeit(jax.jit(lambda k, p: jax.lax.sort_key_val(k, p)), keys, pay1)
        print(f"S={S}: sort key+1 i32 payload   {t*1e3:8.2f} ms")

        sort6 = jax.jit(lambda k, p, pf: jax.lax.sort((k, p) + tuple(pf), num_keys=1))
        t = timeit(sort6, keys, pay1, payf)
        print(f"S={S}: sort key+5 payloads      {t*1e3:8.2f} ms")

        t = timeit(jax.jit(lambda k: jnp.argsort(k)), keys)
        print(f"S={S}: argsort                  {t*1e3:8.2f} ms")

    # gather rates at bench scale
    S = 2_359_296
    table = jnp.asarray(rng.random((R, F2), dtype=np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, R, S, dtype=np.int32))
    idx_sorted = jnp.sort(idx)

    t = timeit(jax.jit(lambda t_, i: jnp.take(t_, i, axis=0)), table, idx)
    print(f"row take (S={S}, {F2}ch) random   {t*1e3:8.2f} ms  ({S/t/1e6:7.2f} Mrows/s)")
    t = timeit(jax.jit(lambda t_, i: jnp.take(t_, i, axis=0)), table, idx_sorted)
    print(f"row take sorted                  {t*1e3:8.2f} ms  ({S/t/1e6:7.2f} Mrows/s)")

    flat = table.reshape(-1).astype(jnp.float32)
    fidx = jnp.asarray(rng.integers(0, R * F2, S, dtype=np.int32))
    t = timeit(jax.jit(lambda t_, i: jnp.take(t_, i)), flat, fidx)
    print(f"flat scalar take (S={S})         {t*1e3:8.2f} ms  ({S/t/1e6:7.2f} M/s)")

    # segment_sum with sorted ids: output-side reduction candidate
    n_seg = S // 12
    seg_sorted = jnp.sort(jnp.asarray(rng.integers(0, n_seg, S, dtype=np.int32)))
    vals = jnp.asarray(rng.random((S, 32), dtype=np.float32))
    t = timeit(jax.jit(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=n_seg, indices_are_sorted=True)), vals, seg_sorted)
    print(f"segment_sum sorted (S={S},32ch)  {t*1e3:8.2f} ms")
    seg_rand = jnp.asarray(rng.integers(0, n_seg, S, dtype=np.int32))
    t = timeit(jax.jit(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=n_seg)), vals, seg_rand)
    print(f"segment_sum random               {t*1e3:8.2f} ms")

    # reduce-12: samples for one point adjacent after inverse perm — reshape sum
    t = timeit(jax.jit(lambda v: v.reshape(-1, 12, 32).sum(axis=1)), vals)
    print(f"reshape sum 12->1                {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
