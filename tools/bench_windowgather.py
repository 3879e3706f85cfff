"""P5: gather-of-windows rates — the tilewin sampler's fetch primitive.

Candidates for fetching one (patch, sample, bone, plane) group's 7×7-texel
feature window + mask window:
  a) lax.gather slices (7,7,32) at UNALIGNED starts from the padded raw
     plane (no table build, no alignment leak)
  b) jnp.take of (16,128) tiles from a stride-4 packed block table
     (measured 70.2 Mtiles/s in bench_tileshape.py — reference point)
  c) lax.gather slices (7,7) from a per-bone mask plane (49 B payload)
  d) lax.gather slices (8,8,32) — pow2 shape, in case Mosaic/XLA prefers it

Run on the real chip: python tools/bench_windowgather.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo/tools")
from tpu_timeit import timeit_amortized  # noqa: E402

NG = 2 ** 19  # windows per call (≈ one frame's coarse-pass group count)


def bench_window_gather(name, operand, starts, slice_sizes, collapse):
    dn = lax.GatherDimensionNumbers(
        offset_dims=tuple(range(1, 1 + len(slice_sizes) - collapse)),
        collapsed_slice_dims=tuple(range(collapse)),
        start_index_map=tuple(range(len(slice_sizes))))

    def run(op, st):
        out = lax.gather(op, st, dn, slice_sizes)
        return out.astype(jnp.float32).sum()

    try:
        sec, _ = timeit_amortized(run, operand, starts, iters=6)
        byts = NG * np.prod(slice_sizes) * operand.dtype.itemsize
        print(f"{name:34s}: {sec*1e3:7.2f} ms/{NG>>10}K -> "
              f"{NG/sec/1e6:7.1f} Mwin/s  {byts/sec/1e9:6.0f} GB/s")
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s}: FAIL {type(e).__name__}: {str(e)[:120]}")
    sys.stdout.flush()


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    H = 258
    plane = jax.random.normal(key, (3, H, H, 32), jnp.bfloat16)
    ks = jax.random.split(key, 8)
    p_idx = jax.random.randint(ks[0], (NG, 1), 0, 3, jnp.int32)
    t0 = jax.random.randint(ks[1], (NG, 1), 0, H - 8, jnp.int32)
    s0 = jax.random.randint(ks[2], (NG, 1), 0, H - 8, jnp.int32)
    z0 = jnp.zeros((NG, 1), jnp.int32)

    starts = jnp.concatenate([p_idx, t0, s0, z0], axis=1)
    bench_window_gather("a) raw-plane (7,7,32) unaligned", plane, starts,
                        (1, 7, 7, 32), 1)
    bench_window_gather("d) raw-plane (8,8,32) unaligned", plane, starts,
                        (1, 8, 8, 32), 1)

    # b) packed stride-4 block table reference
    table = jax.random.normal(key, (3 * 64 * 64, 16, 128), jnp.bfloat16)
    idx = jax.random.randint(ks[3], (NG,), 0, table.shape[0], jnp.int32)

    def run_take(t, ix):
        return jnp.take(t, ix, axis=0).astype(jnp.float32).sum()

    sec, _ = timeit_amortized(run_take, table, idx, iters=6)
    print(f"{'b) take (16,128) packed table':34s}: {sec*1e3:7.2f} ms/"
          f"{NG>>10}K -> {NG/sec/1e6:7.1f} Mwin/s  "
          f"{NG*16*128*2/sec/1e9:6.0f} GB/s")
    sys.stdout.flush()

    # c) mask windows (7,7) from per-(plane,bone) mask planes
    masks = jax.random.normal(key, (3 * 24, H, H), jnp.bfloat16)
    kb = jax.random.randint(ks[4], (NG, 1), 0, 72, jnp.int32)
    starts_m = jnp.concatenate([kb, t0, s0], axis=1)
    bench_window_gather("c) mask (7,7) windows", masks, starts_m,
                        (1, 7, 7), 1)

    # c2) mask packed row take: (3*24*64*64, 32) stride-4 5x5 rows
    mtab = jax.random.normal(key, (3 * 24 * 64 * 64, 32), jnp.bfloat16)
    midx = jax.random.randint(ks[5], (NG,), 0, mtab.shape[0], jnp.int32)
    sec, _ = timeit_amortized(run_take, mtab, midx, iters=6)
    print(f"{'c2) take (32,) mask rows':34s}: {sec*1e3:7.2f} ms/{NG>>10}K -> "
          f"{NG/sec/1e6:7.1f} Mwin/s")
    sys.stdout.flush()

    # e) fused window: feat+mask lanes (7,7,33) from (3K,H,H,33) planes —
    # one gather per group but duplicates feat per bone in the operand
    fused = jax.random.normal(key, (3 * 24, H, H, 33), jnp.bfloat16)
    bench_window_gather("e) fused (7,7,33) per-bone plane", fused, starts_m,
                        (1, 7, 7, 33), 1)


if __name__ == "__main__":
    main()
