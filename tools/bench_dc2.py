"""Split sample_candidates_quadtable internals on the real TPU."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    from enarf_gan_tpu.ops.quadtable import (pack_quadtable,
                                             _quad_cells_weights)

    BASE = [None]

    def timed(fn, *args, iters=3):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return max((time.perf_counter() - t0) / iters - (BASE[0] or 0), 1e-9)

    @jax.jit
    def null(x):
        return x.sum()

    BASE[0] = timed(null, jnp.ones((8, 128)), iters=5)
    print(f"baseline {BASE[0]*1e3:.1f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    B, K, F, ts, M = 1, 23, 32, 256, 4
    n = 4096 * 48
    HpWp = (ts + 1) * (ts + 1)

    cand_pos = jax.random.uniform(key, (B, n, M, 3), jnp.float32, -1, 1)
    planes = jax.random.normal(key, (B, (F + K) * 3, ts, ts), jnp.float32)
    ft, mt = jax.jit(lambda p: pack_quadtable(p, F, K, jnp.bfloat16))(planes)

    # (c1) transpose + cells + weights
    @jax.jit
    def c1(cand_pos):
        cp = cand_pos.transpose(0, 3, 2, 1)
        cells, wq = _quad_cells_weights(cp, ts, ts)
        return cells.sum() + sum(w.sum() for w in wq)

    print(f"(c1) cells+weights: {timed(c1, cand_pos)*1e3:8.2f} ms", flush=True)

    @jax.jit
    def mk(cand_pos):
        cp = cand_pos.transpose(0, 3, 2, 1)
        cells, wq = _quad_cells_weights(cp, ts, ts)
        plane = jnp.arange(3, dtype=jnp.int32).reshape(1, 3, 1, 1)
        frows = plane * HpWp + cells
        return frows, wq

    frows, wq = mk(cand_pos)

    # (c2) feature take alone
    @jax.jit
    def c2(ft, frows):
        g = jnp.take(ft.reshape(-1, 4 * F), frows.reshape(-1), axis=0)
        return g.astype(jnp.float32).sum()

    print(f"(c2) feature take (2.36M rows, 128 lanes bf16): "
          f"{timed(c2, ft, frows)*1e3:8.2f} ms", flush=True)

    # (c3) take + quad combine + plane sum
    @jax.jit
    def c3(ft, frows, *wq):
        g = jnp.take(ft.reshape(-1, 4 * F), frows.reshape(-1), axis=0) \
            .reshape(B, 3, M, n, 4 * F)
        feat = sum(g[..., q * F:(q + 1) * F]
                   * wq[q][..., None].astype(g.dtype) for q in range(4))
        return feat.astype(jnp.float32).sum(axis=1).sum()

    print(f"(c3) take+combine+planesum: {timed(c3, ft, frows, *wq)*1e3:8.2f} ms",
          flush=True)

    # (c3b) combine in bf16 accumulation (half the intermediate bytes)
    @jax.jit
    def c3b(ft, frows, *wq):
        g = jnp.take(ft.reshape(-1, 4 * F), frows.reshape(-1), axis=0) \
            .reshape(B, 3, M, n, 4 * F)
        feat = sum(g[..., q * F:(q + 1) * F]
                   * wq[q][..., None].astype(g.dtype) for q in range(4))
        return feat.sum(axis=1).astype(jnp.float32).sum()

    print(f"(c3b) same, bf16 intermediates: {timed(c3b, ft, frows, *wq)*1e3:8.2f} ms",
          flush=True)

    # (c4) mask chain alone
    ci = jax.random.randint(key, (B, n, M), 0, K, jnp.int32)

    @jax.jit
    def c4(mt, frows, ci, *wq):
        plane = jnp.arange(3, dtype=jnp.int32).reshape(1, 3, 1, 1)
        cit = ci.transpose(0, 2, 1)[:, None]
        mrows = frows + (cit * 3) * HpWp  # same structure as real path
        gm = jnp.take(mt.reshape(-1, 4), mrows.reshape(-1), axis=0) \
            .reshape(B, 3, M, n, 4)
        logit = sum(gm[..., q].astype(jnp.float32) * wq[q] for q in range(4))
        return jax.nn.sigmoid(logit).prod(axis=1).sum()

    print(f"(c4) mask chain: {timed(c4, mt, frows, ci, *wq)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
