"""Ablate the hat combine kernel's internal stages on chip.

PERF.md round 4: the hat pallas_call alone on resident inputs costs
15.06 ms per coarse chunk — the same order as the whole XLA combine — so
before building the round-5 gather-in-kernel sampler we need to know WHERE
those 15 ms go. Each ablation replaces one stage with a constant of the
same shape (the rest of the dataflow is unchanged, so nothing can be
DCE'd past the stage boundary):

  full    the real kernel (baseline)
  noA4    A4 hat-weight construction replaced by a hoisted constant
          (umask alone) — isolates the per-(g,p) VPU weight-build cost
  nomask  mask-logit (wl hats + 64-lane reduce + sigmoid) replaced by 1
  noSg    the 4-quarter s-interpolation accumulation replaced by a
          single unweighted slice add
  nomxu   the blockdiag dot_general replaced by a broadcast of win's
          first sublane (keeps A4 construction + everything downstream)

Env: ABLATE=csv subset, U (units, default 12288), REPS.
"""
from __future__ import annotations

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
    from enarf_gan_tpu.ops.tilewin_kernel import TB, M, NTEX, WIN
    from tools.tpu_timeit import timeit_amortized

    F, Mp = 32, 4
    U = int(os.environ.get("U", 12288))
    sel = os.environ.get("ABLATE", "").split(",") \
        if os.environ.get("ABLATE") else None

    rng = np.random.default_rng(0)
    B = 1
    win = jnp.asarray(rng.normal(size=(B, 3, Mp, U, 16, 128))
                      .astype(np.float32).astype(jnp.bfloat16))
    mwin = jnp.asarray(rng.normal(size=(B, 3, Mp, U, NTEX))
                       .astype(np.float32).astype(jnp.bfloat16))
    xt = jnp.asarray(rng.uniform(0, WIN - 1, (B, 3, Mp, U, M, 1))
                     .astype(np.float32))
    xs = jnp.asarray(rng.uniform(0, WIN - 1, (B, 3, Mp, U, M, 1))
                     .astype(np.float32))
    valid = jnp.asarray((rng.uniform(size=(B, Mp, U, M, 1)) > 0.1)
                        .astype(np.float32))

    def make_kernel(mode):
        f32 = jnp.float32

        def kern(win_ref, mwin_ref, xt_ref, xs_ref, valid_ref,
                 feat_ref, candw_ref):
            lam = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 2)
            uu = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 0) % 8
            hh = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 1) // M
            sig = lam % 16
            umask = ((lam // 16 == uu) & (sig % 2 == hh)).astype(f32)
            tt = (sig // 2).astype(f32)
            wt_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                    // WIN).astype(f32)
            ws_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                    % WIN).astype(f32)
            umask_b = umask.astype(jnp.bfloat16).reshape(TB // 8, 8 * 2 * M, 128)

            def hat(iota_v, x):
                return jnp.maximum(0.0, 1.0 - jnp.abs(iota_v - x))

            def plane_body(p, carry, g):
                Sg, cw = carry
                w = win_ref[0, p, g]
                xtv = xt_ref[0, p, g]
                xsv = xs_ref[0, p, g]
                vv = valid_ref[0, g]
                if mode == "noA4":
                    Ab = umask_b
                else:
                    xt2 = jnp.concatenate([xtv, xtv], axis=1)
                    A4 = hat(tt, xt2) * umask
                    Ab = A4.astype(jnp.bfloat16).reshape(TB // 8, 8 * 2 * M, 128)
                if mode == "nomxu":
                    D = jnp.broadcast_to(
                        w[:, :1].astype(f32) + Ab.reshape(
                            TB, 2 * M, 128)[:, :1].astype(f32) * 0.0,
                        (TB, 2 * M, 128))
                else:
                    Wb = w.reshape(TB // 8, 8 * 16, 128)
                    D = jax.lax.dot_general(
                        Ab, Wb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=f32).reshape(TB, 2 * M, 128)
                D0 = jax.lax.slice_in_dim(D, 0, M, axis=1)
                D1 = jax.lax.slice_in_dim(D, M, 2 * M, axis=1)
                if mode == "noSg":
                    Sg = Sg + jax.lax.slice_in_dim(D0, 0, F, axis=2)
                else:
                    for qq in range(4):
                        b0 = hat(jnp.float32(qq), xsv)
                        b1 = hat(jnp.float32(qq + 4), xsv)
                        Dq0 = jax.lax.slice_in_dim(D0, qq * F, (qq + 1) * F,
                                                   axis=2)
                        Dq1 = jax.lax.slice_in_dim(D1, qq * F, (qq + 1) * F,
                                                   axis=2)
                        Sg = Sg + Dq0 * b0 + Dq1 * b1
                if mode == "nomask":
                    cw = cw * 0.5
                else:
                    wl = hat(wt_i, xtv) * hat(ws_i, xsv) * vv
                    mw = mwin_ref[0, p, g].astype(f32)
                    lg = (wl * mw[:, None, :]).sum(axis=-1, keepdims=True)
                    cw = cw * jax.nn.sigmoid(lg)
                return Sg, cw

            def g_body(g, feat_acc):
                Sg0 = jnp.zeros((TB, M, F), f32)
                cw0 = jnp.ones((TB, M, 1), f32)
                Sg, cw = jax.lax.fori_loop(
                    0, 3, lambda p, c: plane_body(p, c, g), (Sg0, cw0))
                candw_ref[0, g] = cw
                return feat_acc + Sg * (cw * valid_ref[0, g])

            feat_ref[0] = jax.lax.fori_loop(0, Mp, g_body,
                                            jnp.zeros((TB, M, F), f32))

        return kern

    def run(mode):
        def im6(b, i):
            return (b, 0, 0, i, 0, 0)

        spec_c = pl.BlockSpec((1, 3, Mp, TB, M, 1), im6,
                              memory_space=pltpu.VMEM)

        def f(w, mw, a, b, v):
            feat, cw = pl.pallas_call(
                make_kernel(mode),
                grid=(B, U // TB),
                in_specs=[pl.BlockSpec((1, 3, Mp, TB, 16, 128), im6,
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, 3, Mp, TB, NTEX),
                                       lambda b_, i: (b_, 0, 0, i, 0),
                                       memory_space=pltpu.VMEM),
                          spec_c, spec_c,
                          pl.BlockSpec((1, Mp, TB, M, 1),
                                       lambda b_, i: (b_, 0, i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((1, TB, M, F),
                                        lambda b_, i: (b_, i, 0, 0),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((1, Mp, TB, M, 1),
                                        lambda b_, i: (b_, 0, i, 0, 0),
                                        memory_space=pltpu.VMEM)],
                out_shape=[jax.ShapeDtypeStruct((B, U, M, F), jnp.float32),
                           jax.ShapeDtypeStruct((B, Mp, U, M, 1), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=(jax.default_backend() != "tpu"),
            )(w, mw, a, b, v)
            return feat.sum() + cw.sum()

        try:
            sec, disp = timeit_amortized(f, win, mwin, xt, xs, valid,
                                         iters=4, perturb=2)
            print(f"{mode:8s}: {sec*1e3:7.2f} ms (dispatch {disp*1e3:.0f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{mode:8s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    for mode in ("full", "noA4", "nomask", "noSg", "nomxu"):
        if sel is None or mode in sel:
            run(mode)


if __name__ == "__main__":
    main()
