"""Unirow vs quadtable sampler on the real chip (DSO chunk shapes).

1. Correctness: Pallas combine vs XLA combine on-device (max|Δ| scalar).
2. Rates: end-to-end sample_candidates_* for one 4096-ray x 48-sample chunk
   (B=1, F=32, K=23, M=4, 256² planes) — quad vs unirow/xla vs unirow/pallas.

Run on the chip: python tools/bench_unirow_vs_quad.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax            # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_timeit import timeit_amortized  # noqa: E402

B, F, K, M = 1, 32, 23, 4
H = W = 256
N = 4096 * 48


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.normal(size=(B, (F + K) * 3, H, W))
                         .astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1.2, 1.2, (B, N, M, 3))
                      .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, K, (B, N, M)).astype(np.int32))
    valid = jnp.asarray(rng.random((B, N, M)) > 0.2)

    from enarf_gan_tpu.ops.unirow import (pack_unirow,
                                          sample_candidates_unirow)
    from enarf_gan_tpu.ops.quadtable import (pack_quadtable,
                                             sample_candidates_quadtable)

    ut = jax.jit(lambda p: pack_unirow(p, F, K))(planes)
    qt = jax.jit(lambda p: pack_quadtable(p, F, K, jnp.bfloat16))(planes)
    print(f"unirow table {ut.shape} {ut.dtype} "
          f"{ut.size * ut.dtype.itemsize / 1e6:.0f} MB; "
          f"quad tables {[t.shape for t in qt]}")

    # -- correctness: pallas vs xla combine, on-device max|delta|
    def run(mode):
        os.environ["ENARF_UNIROW_COMBINE"] = mode
        f, w = sample_candidates_unirow(ut, pos, idx, valid, F, K, H, W)
        return f, w

    fp, wp = jax.jit(lambda: run("pallas"))()
    fx, wx = jax.jit(lambda: run("xla"))()
    df = float(jnp.abs(fp - fx).max())
    dw = float(jnp.abs(wp - wx).max())
    print(f"pallas-vs-xla combine: max|df|={df:.3e} max|dw|={dw:.3e}")
    os.environ["ENARF_UNIROW_COMBINE"] = "auto"

    # -- rates (forward)
    def uni(mode):
        def f(table, pos):
            os.environ["ENARF_UNIROW_COMBINE"] = mode
            feat, w = sample_candidates_unirow(table, pos, idx, valid,
                                               F, K, H, W)
            return feat.sum() + w.sum()
        return f

    def quad(tables, pos):
        feat, w = sample_candidates_quadtable(tables, pos, idx, valid,
                                              F, K, H, W)
        return feat.astype(jnp.float32).sum() + w.astype(jnp.float32).sum()

    for name, fn, args in (
            ("quadtable  ", quad, (qt, pos)),
            ("unirow/xla ", uni("xla"), (ut, pos)),
            ("unirow/plls", uni("pallas"), (ut, pos))):
        try:
            s, disp = timeit_amortized(fn, *args, iters=8, perturb=1)
            print(f"{name}: {s * 1e3:7.2f} ms/chunk "
                  f"({N * M * 3 / s / 1e6:7.1f} Mfetch/s) "
                  f"[dispatch {disp * 1e3:.0f} ms]")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()

    # -- rates (fwd+bwd through the combine, planes fixed)
    def uni_grad(mode):
        def f(table, pos):
            os.environ["ENARF_UNIROW_COMBINE"] = mode
            def loss(pp):
                feat, w = sample_candidates_unirow(table, pp, idx, valid,
                                                   F, K, H, W)
                return feat.sum() + w.sum()
            return jax.grad(loss)(pos).sum()
        return f

    def quad_grad(tables, pos):
        def loss(pp):
            feat, w = sample_candidates_quadtable(tables, pp, idx, valid,
                                                  F, K, H, W)
            return feat.astype(jnp.float32).sum() + \
                w.astype(jnp.float32).sum()
        return jax.grad(loss)(pos).sum()

    for name, fn, args in (
            ("quad fwd+bwd", quad_grad, (qt, pos)),
            ("uni  fwd+bwd", uni_grad("auto"), (ut, pos))):
        try:
            s, disp = timeit_amortized(fn, *args, iters=6, perturb=1)
            print(f"{name}: {s * 1e3:7.2f} ms/chunk")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
