"""De-risk the round-5 gather-in-kernel sampler design (on-chip probes).

PERF.md round 4 concluded the winning sampler kernel must do its own
window-row gather (async DMA from an HBM-resident table into VMEM,
combine in place, one HBM pass) instead of consuming an XLA `jnp.take`
(33.5 Mwin/s = 137 GB/s, issue-bound, plus a second HBM round-trip).
Two unknowns decide feasibility on THIS toolchain; each probe measures
one:

  dma    indexed per-row async-copy gather: grid over row blocks, row ids
         in an SMEM block, R (16,128)-tile DMAs in flight per block with
         a Q-deep semaphore ring. Reports Mwin/s + GB/s to compare with
         the jnp.take baseline. Knobs: R (rows/block), Q (ring depth),
         NROWS (table), NG (total rows fetched).
  relay  in-kernel (TB, M) lane->sublane relayout (jnp.swapaxes): the
         cost that decides whether kernel coordinates can ship compact
         ((..., M)-minor, 8x pad) instead of the 128x-padded (..., M, 1)
         layout the hat kernel uses. Times REP relayouts per block.

Env: PROBES=csv subset, R, Q, NG, REP.
AXON SAFETY: scalar-reduced outputs, serialized calls (tools/tpu_timeit).
"""
import functools
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
    from tools.tpu_timeit import timeit_amortized

    sel = os.environ.get("PROBES", "").split(",") \
        if os.environ.get("PROBES") else None
    NROWS = int(os.environ.get("NROWS", 48387))
    NG = int(os.environ.get("NG", 147456))
    R = int(os.environ.get("R", 256))        # rows gathered per grid block
    Q = int(os.environ.get("Q", 8))          # DMA semaphore ring depth
    Q = min(Q, R)        # a ring deeper than the rows/block would index r<0
    NG = (NG // R) * R   # whole blocks only; use the rounded NG in the math
    REP = int(os.environ.get("REP", 12))     # relayouts per block
    ROWH = int(os.environ.get("ROWH", 16))   # sublanes per fetched row
    TB, M = 64, 16

    def put(x):
        a = jnp.asarray(x)
        np.asarray(a.ravel()[:1])
        return a

    rng = np.random.default_rng(0)

    if sel is None or "dma" in sel:
        table = put(rng.normal(size=(NROWS, ROWH, 128)).astype(np.float32)
                    .astype(jnp.bfloat16))
        idx = put(rng.integers(0, NROWS, NG).astype(np.int32))

        # NOTE (round 5, /tmp/dma_micro bisect): a rank-1 BLOCKED SMEM input
        # (BlockSpec((R,), ..., memory_space=SMEM)) crashes this toolchain's
        # remote compile helper (HTTP 500) even with no dynamic indexing at
        # all. Scalar-PREFETCH SMEM args (num_scalar_prefetch=1, whole array
        # resident, indexed as idx_ref[i*R + r]) compile and run fine — the
        # kernel must take its row ids that way.
        def dma_kernel(idx_ref, table_ref, out_ref, buf, sems):
            base = pl.program_id(0) * R

            # issue R row DMAs with a Q-deep in-flight ring: start copy r,
            # and before starting r wait on the (r - Q)-th via the shared
            # ring slot — classic software pipeline
            def start(r):
                pltpu.make_async_copy(
                    table_ref.at[idx_ref[base + r]], buf.at[r], sems.at[r % Q]
                ).start()

            def wait(r):
                pltpu.make_async_copy(
                    table_ref.at[idx_ref[base + r]], buf.at[r], sems.at[r % Q]
                ).wait()

            def body(r, _):
                @pl.when(r >= Q)
                def _():
                    wait(r - Q)
                start(r)
                return 0

            jax.lax.fori_loop(0, R, body, 0)

            def tail(r, _):
                wait(r)
                return 0

            jax.lax.fori_loop(R - Q, R, tail, 0)
            out_ref[...] = jnp.broadcast_to(
                buf[...].astype(jnp.float32).sum(), (1, 8, 128))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NG // R,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, ix: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((R, ROWH, 128), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((Q,))],
        )

        def run_dma(t, ix):
            out = pl.pallas_call(
                dma_kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((NG // R, 8, 128), jnp.float32),
                interpret=(jax.default_backend() != "tpu"),
            )(ix, t)
            return out[:, 0, 0].sum()

        try:
            sec, disp = timeit_amortized(run_dma, table, idx, iters=6,
                                         perturb=1)
            row_bytes = ROWH * 128 * 2
            print(f"dma   R={R} Q={Q} ROWH={ROWH}: {sec*1e3:7.2f} ms -> "
                  f"{NG/sec/1e6:.1f} Mrow/s, "
                  f"{NG*row_bytes/sec/1e9:.0f} GB/s "
                  f"(dispatch {disp*1e3:.0f} ms)", flush=True)
        except Exception as e:
            print(f"dma FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)

    if sel is None or "relay" in sel:
        NB = 192
        x = put(rng.normal(size=(NB, TB, M)).astype(np.float32))

        def relay_kernel(x_ref, out_ref):
            acc = jnp.zeros((M, TB), jnp.float32)
            for r in range(REP):
                acc = acc + jnp.swapaxes(x_ref[0] + jnp.float32(r), 0, 1)
            out_ref[0] = acc

        def run_relay(v):
            out = pl.pallas_call(
                relay_kernel, grid=(NB,),
                in_specs=[pl.BlockSpec((1, TB, M), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, M, TB), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NB, M, TB), jnp.float32),
                interpret=(jax.default_backend() != "tpu"),
            )(v)
            return out.sum()

        try:
            sec, disp = timeit_amortized(run_relay, x, iters=6, perturb=0)
            per = sec / (NB * REP) * 1e6
            print(f"relay REP={REP}: {sec*1e3:7.2f} ms -> {per:.2f} us per "
                  f"(64,16) lane->sublane relayout "
                  f"(dispatch {disp*1e3:.0f} ms)", flush=True)
        except Exception as e:
            print(f"relay FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
