"""Round-2 sampler design probes (real TPU chip).

Questions this answers (PERF.md round-3 section feeds off these):
  P1  Is Mosaic's in-kernel dynamic gather still broken on this toolchain?
      (jnp.take / dynamic_slice-loop on a VMEM-resident table inside Pallas.)
  P2  Rate of ONE packed 66-lane f32 row take — the "unitable" row that
      carries feat quad (128 bf16 -> 64 f32 lanes, bitcast-packed) + mask
      quad (4 bf16 -> 2 f32) with the bone id folded into the row index.
      If this runs at the same issue rate as the current 128-lane bf16 feat
      take, one fetch replaces today's two (feat + mask).
  P3  Tile-granularity take: gathering (1, 8, 128) supertiles from a 3-D
      table — does XLA issue these at row rate (8 cells/issue)?
  P4  Packed-row XLA combine (bitcast -> quad FMA -> sigmoid prod ->
      weighted sum) end-to-end vs the current two-table combine.

Run: python tools/bench_unitable.py            (on the real chip)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from tpu_timeit import timeit_amortized  # noqa: E402

K, F = 24, 32
H = W = 256
CELLS = (H + 1) * (W + 1)
N = 4096 * 48          # one chunk of points
M = 4
NFETCH = N * M * 3     # fetch count per chunk


def probe_p1():
    """Mosaic in-kernel gather status."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    table = jax.random.normal(jax.random.PRNGKey(0), (8192, 128),
                              jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1024,), 0, 8192,
                             jnp.int32)

    results = {}

    def kern_take(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    def kern_dslice(idx_ref, tab_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = tab_ref[pl.ds(idx_ref[i], 1), :][0]
            return 0
        jax.lax.fori_loop(0, 1024, body, 0)

    for name, kern in (("take", kern_take), ("dslice_loop", kern_dslice)):
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, table)
            ref = np.asarray(jnp.take(table, idx, axis=0))
            ok = np.allclose(np.asarray(out), ref)
            if not ok:
                results[name] = "WRONG RESULT"
                continue
            # time it: per-row cost
            def run(ix):
                return pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(ix, table)
            s, _ = timeit_amortized(run, idx, iters=50)
            results[name] = f"OK {1024/s/1e6:.1f} Mrows/s"
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {str(e)[:140]}"
    for k, v in results.items():
        print(f"P1 pallas {k:12s}: {v}")
        sys.stdout.flush()


def probe_p2():
    key = jax.random.PRNGKey(0)
    n_idx = 2 ** 21

    cases = [
        ("bf16 128-lane (feat today)", (3 * CELLS, 128), jnp.bfloat16),
        ("bf16 4-lane  (mask today)", (K * 3 * CELLS, 4), jnp.bfloat16),
        ("f32  66-lane (unitable)", (K * 3 * CELLS, 66), jnp.float32),
        ("f32  72-lane (unitable pad)", (K * 3 * CELLS, 72), jnp.float32),
        ("bf16 132-lane", (K * 3 * CELLS, 132), jnp.bfloat16),
    ]
    for name, shape, dtype in cases:
        table = jax.random.normal(key, shape, dtype)
        idx = jax.random.randint(key, (n_idx,), 0, shape[0], jnp.int32)

        def run(t, ix):
            return jnp.take(t, ix, axis=0).astype(jnp.float32).sum()

        s, _ = timeit_amortized(run, table, idx, iters=8)
        print(f"P2 take {name:28s}: {s*1e3:7.2f} ms/2M rows -> "
              f"{n_idx/s/1e6:7.1f} Mrows/s")
        sys.stdout.flush()


def probe_p3():
    key = jax.random.PRNGKey(0)
    n_idx = 2 ** 19
    table = jax.random.normal(key, (3 * 257 * 33, 8, 128), jnp.bfloat16)
    idx = jax.random.randint(key, (n_idx,), 0, table.shape[0], jnp.int32)

    def run(t, ix):
        return jnp.take(t, ix, axis=0).astype(jnp.float32).sum()

    s, _ = timeit_amortized(run, table, idx, iters=8)
    print(f"P3 take (1,8,128) bf16 tiles: {s*1e3:7.2f} ms/512K tiles -> "
          f"{n_idx/s/1e6:7.1f} Mtiles/s = {n_idx*8/s/1e6:8.1f} Mrows/s-equiv")
    sys.stdout.flush()


def probe_p4():
    """Packed-row gather + combine, XLA end-to-end, chunk-sized."""
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (K * 3 * CELLS, 66), jnp.float32)
    rows = jax.random.randint(key, (3, M, N), 0, K * 3 * CELLS, jnp.int32)
    wq = jax.random.uniform(key, (4, 3, M, N), jnp.float32)
    valid = (jax.random.uniform(key, (M, N)) > 0.3).astype(jnp.float32)

    def combine(t, r, w, v):
        g = jnp.take(t, r.reshape(-1), axis=0).reshape(3, M, N, 66)
        gb = jax.lax.bitcast_convert_type(g, jnp.bfloat16)  # (3,M,N,66,2)
        gb = gb.reshape(3, M, N, 132)
        feat = sum(gb[..., q * F:(q + 1) * F].astype(jnp.float32)
                   * w[q][..., None] for q in range(4))      # (3,M,N,F)
        logit = sum(gb[..., 128 + q].astype(jnp.float32) * w[q]
                    for q in range(4))                        # (3,M,N)
        cw = jax.nn.sigmoid(logit).prod(axis=0)               # (M,N)
        feat = feat.sum(axis=0)                               # (M,N,F)
        out = (feat * (cw * v)[..., None]).sum(axis=0)        # (N,F)
        return out.sum()

    s, _ = timeit_amortized(combine, table, rows, wq, valid, iters=6)
    print(f"P4 unitable take+combine chunk ({NFETCH/1e6:.2f}M fetches): "
          f"{s*1e3:7.2f} ms -> {NFETCH/s/1e6:7.1f} Mfetch/s")
    sys.stdout.flush()

    # takes alone for the same rows
    def takes_only(t, r):
        return jnp.take(t, r.reshape(-1), axis=0).astype(jnp.float32).sum()

    s2, _ = timeit_amortized(takes_only, table, rows, iters=6)
    print(f"P4 unitable take only              : {s2*1e3:7.2f} ms -> "
          f"{NFETCH/s2/1e6:7.1f} Mfetch/s (combine adds {max(s-s2,0)*1e3:.2f} ms)")
    sys.stdout.flush()


def main():
    print(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    probe_p1()
    probe_p2()
    probe_p3()
    probe_p4()
    print(f"total {time.perf_counter()-t0:.0f}s")


if __name__ == "__main__":
    main()
