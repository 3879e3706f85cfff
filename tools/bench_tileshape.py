"""Take-rate vs tile shape + block-select einsum rate (tilepack design probe).

bench_unitable.py P3 found ONE tile shape, (1,8,128) bf16, gathers at
113.5 Mtiles/s = 908 M row-equivs/s. The tilepack sampler design needs the
full curve: issue rate vs sublane count and lane width, to pick the feature
block size, plus the per-member corner-select batched matmul rate.

Run on the real chip: python tools/bench_tileshape.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from tpu_timeit import timeit_amortized  # noqa: E402


def probe_tiles():
    key = jax.random.PRNGKey(0)
    n_idx = 2 ** 20
    for s, L in [(1, 128), (2, 128), (4, 128), (8, 128), (16, 128),
                 (32, 128), (1, 256), (4, 256), (8, 256)]:
        R = max(3 * 64 * 64, 8192)
        table = jax.random.normal(key, (R, s, L), jnp.bfloat16)
        idx = jax.random.randint(key, (n_idx,), 0, R, jnp.int32)

        def run(t, ix):
            return jnp.take(t, ix, axis=0).astype(jnp.float32).sum()

        sec, _ = timeit_amortized(run, table, idx, iters=6)
        byts = n_idx * s * L * 2
        print(f"take ({s:2d},{L}) bf16 tiles: {sec*1e3:7.2f} ms/1M -> "
              f"{n_idx/sec/1e6:7.1f} Mtiles/s  {byts/sec/1e9:6.0f} GB/s")
        sys.stdout.flush()


def probe_select():
    """Per-member corner-select+bilinear as batched matmul:
    (G, m, 25) one-hot-ish weights @ (G, 25, C) blocks -> (G, m, C)."""
    key = jax.random.PRNGKey(1)
    for G, m, P2, C in [(65536, 16, 25, 33), (131072, 16, 25, 33),
                        (65536, 16, 49, 33), (65536, 64, 25, 33)]:
        w = jax.random.normal(key, (G, m, P2), jnp.bfloat16)
        blk = jax.random.normal(key, (G, P2, C), jnp.bfloat16)

        def run(w_, b_):
            return jnp.einsum("gmp,gpc->gmc", w_, b_,
                              preferred_element_type=jnp.float32).sum()

        sec, _ = timeit_amortized(run, w, blk, iters=6)
        members = G * m
        print(f"select G={G} m={m} p={P2} c={C}: {sec*1e3:7.2f} ms -> "
              f"{members/sec/1e6:8.1f} Mmembers/s "
              f"({members*P2*C*2/sec/1e12:5.1f} TFLOP/s)")
        sys.stdout.flush()


def probe_weight_build():
    """Cost of building the 25-wide bilinear corner-weight vectors on VPU:
    dt,ds in [0,5) float -> w[p] = wq over 4 corners scattered into 25."""
    key = jax.random.PRNGKey(2)
    G, m = 131072, 16
    dt = jax.random.uniform(key, (G, m)) * 4
    ds = jax.random.uniform(key, (G, m)) * 4

    def run(dt_, ds_):
        t0 = jnp.floor(dt_)
        s0 = jnp.floor(ds_)
        ft, fs = dt_ - t0, ds_ - s0
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, m, 25), 2)
        ti, si = iota // 5, iota % 5
        wt = jnp.where(ti == t0[..., None].astype(jnp.int32), 1 - ft[..., None],
                       jnp.where(ti == t0[..., None].astype(jnp.int32) + 1,
                                 ft[..., None], 0.0))
        ws = jnp.where(si == s0[..., None].astype(jnp.int32), 1 - fs[..., None],
                       jnp.where(si == s0[..., None].astype(jnp.int32) + 1,
                                 fs[..., None], 0.0))
        return (wt * ws).astype(jnp.bfloat16).sum()

    sec, _ = timeit_amortized(run, dt, ds, iters=6)
    print(f"weight-build G={G} m={m}: {sec*1e3:7.2f} ms -> "
          f"{G*m/sec/1e6:8.1f} Mmembers/s")
    sys.stdout.flush()


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    probe_tiles()
    probe_select()
    probe_weight_build()
