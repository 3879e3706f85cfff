"""Probe tpu.dynamic_gather (Mosaic sublane gather) + VMEM capacity.

dynamic_gather constraint (jax mosaic lowering): idx.shape == table.shape,
out[i, l] = table[idx[i, l], l]. We probe: does it compile at useful heights,
and how fast is it (rows/s) — the make-or-break numbers for a VMEM-resident
tri-plane sampler.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def probe_dynamic_gather():
    key = jax.random.PRNGKey(0)
    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for N in (512, 1024, 2048, 8192):
            L = 128
            REP = 16  # gathers per kernel invocation (amortize grid overhead)
            n_blocks = 128

            def kernel(tab_ref, idx_ref, out_ref):
                t = tab_ref[:]
                acc = jnp.zeros((N, L), dtype)
                for r in range(REP):
                    g = jnp.take_along_axis(t, idx_ref[:] + r, axis=0)
                    acc = acc + g
                out_ref[:] = acc.astype(jnp.float32)

            tab = jax.random.normal(key, (n_blocks * N, L), dtype)
            idx = jax.random.randint(key, (n_blocks * N, L), 0, N - REP,
                                     jnp.int32)
            try:
                f = pl.pallas_call(
                    kernel,
                    grid=(n_blocks,),
                    in_specs=[
                        pl.BlockSpec((N, L), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((N, L), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((N, L), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_blocks * N, L),
                                                   jnp.float32),
                )
                jf = jax.jit(lambda t, ix: f(t, ix).sum())
                s = timed(jf, tab, idx)
                rows = n_blocks * N * REP
                print(f"dynamic_gather {dname} N={N:6d}: {s*1e3:8.2f} ms "
                      f"-> {rows/s/1e6:9.1f} Mrows/s")
            except Exception as e:
                print(f"dynamic_gather {dname} N={N:6d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")
                sys.stdout.flush()


def probe_vmem():
    """Find max VMEM scratch a trivial kernel can allocate."""
    for mb in (16, 32, 48, 64, 96, 112, 120):
        rows = mb * 1024 * 1024 // (128 * 4)

        def kernel(in_ref, out_ref, scratch):
            scratch[0, :] = in_ref[0, :]
            out_ref[:] = scratch[0, :] + scratch[rows - 1, :]

        try:
            f = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec((8, 128), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((128,), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((128,), jnp.float32),
                scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )
            x = jnp.ones((8, 128), jnp.float32)
            _ = np.asarray(jax.jit(f)(x))[0]
            print(f"VMEM scratch {mb} MB: OK")
        except Exception as e:
            print(f"VMEM scratch {mb} MB: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")
            break


def probe_onehot_batched():
    """One-hot MXU gather without scan overhead: batched einsum."""
    key = jax.random.PRNGKey(1)
    for TILE in (128, 256, 512):
        NB, BLK, L = 256, 512, 128
        ix = jax.random.randint(key, (NB, BLK), 0, TILE, jnp.int32)
        tab = jax.random.normal(key, (TILE, L), jnp.bfloat16)

        @jax.jit
        def f(t, ix):
            oh = jax.nn.one_hot(ix, TILE, dtype=jnp.bfloat16)  # (NB,BLK,TILE)
            g = jnp.einsum("nbt,tl->nbl", oh, t,
                           preferred_element_type=jnp.float32)
            return g.sum()

        s = timed(f, tab, ix)
        print(f"onehot batched einsum TILE={TILE}: {s*1e3:8.2f} ms -> "
              f"{NB*BLK/s/1e6:9.1f} Mrows/s")


def probe_dyn_slice_load():
    """Dynamic-slice window loads from a VMEM-resident table inside a kernel."""
    key = jax.random.PRNGKey(2)
    H, L, WIN = 32768, 128, 32
    NWIN = 512

    def kernel(tab_ref, off_ref, out_ref):
        acc = jnp.zeros((WIN, L), jnp.float32)
        def body(i, acc):
            o = off_ref[i, 0]
            return acc + tab_ref[pl.ds(o, WIN), :]
        acc = jax.lax.fori_loop(0, NWIN, body, acc)
        out_ref[:] = acc

    tab = jax.random.normal(key, (H, L), jnp.float32)
    off = jax.random.randint(key, (NWIN, 1), 0, H - WIN, jnp.int32)
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((H, L), memory_space=pltpu.VMEM),
                      pl.BlockSpec((NWIN, 1), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((WIN, L), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((WIN, L), jnp.float32),
        )
        jf = jax.jit(lambda t, o: f(t, o).sum())
        s = timed(jf, tab, off)
        print(f"dyn-slice window load ({NWIN}x{WIN} rows from H={H}): "
              f"{s*1e3:8.2f} ms -> {NWIN*WIN/s/1e6:9.1f} Mrows/s")
    except Exception as e:
        print(f"dyn-slice window load: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    probe_vmem()
    sys.stdout.flush()
    probe_dynamic_gather()
    sys.stdout.flush()
    probe_onehot_batched()
    sys.stdout.flush()
    probe_dyn_slice_load()
