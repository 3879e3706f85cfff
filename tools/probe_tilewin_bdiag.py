"""What is the bdiag tilewin combine kernel bound by? (on-chip probe)

Times doctored variants of the v3 blockdiag kernel at chunk scale
(U=12288 units = 4096 rays x 48 samples) to split its cost:

  stream   read all inputs, write outputs (DMA floor; trivial compute)
  featA    feature path, A4 = constant mask only (no sepw build)
  featD    feature path, dot replaced by a cheap sublane reduction
  featB    feature path, B0/B1 = 1 (no s-weight build)
  feat     feature path only (mask logits skipped)
  mask     mask-logit path only (feature written from a cheap reduce)
  full     the real kernel

Env: V=csv of variants, U, ITERS.
"""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from enarf_gan_tpu.ops.tilewin_kernel import TB, M, NTEX, WIN
    from tools.tpu_timeit import timeit_amortized

    B, Mp, F = 1, 4, 32
    U = int(os.environ.get("U", 12288))
    ITERS = int(os.environ.get("ITERS", 8))
    sel = os.environ.get("V", "").split(",") if os.environ.get("V") else None
    f32 = jnp.float32

    def kernel(win_ref, mwin_ref, dt_ref, ds_ref, fy_ref, fx_ref, valid_ref,
               feat_ref, candw_ref, *, variant: str):
        lam = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 2)
        uu = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 0) % 8
        hh = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 1) // M
        sig = lam % 16
        umask = ((lam // 16 == uu) & (sig % 2 == hh)).astype(f32)
        tt = (sig // 2).astype(f32)
        q = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, 128), 2) // F) \
            .astype(f32)
        wt_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                // WIN).astype(f32)
        ws_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                % WIN).astype(f32)
        lamr = jax.lax.broadcasted_iota(jnp.int32, (128, F), 0)
        ffr = jax.lax.broadcasted_iota(jnp.int32, (128, F), 1)
        R = (lamr % F == ffr).astype(f32)

        def sepw(iota_v, d, frac):
            d = d[..., None]
            frac = frac[..., None]
            return (jnp.where(iota_v == d, 1.0 - frac, 0.0)
                    + jnp.where(iota_v == d + 1.0, frac, 0.0))

        if variant == "stream":
            acc = jnp.zeros((TB, M), f32)
            for g in range(Mp):
                for p in range(3):
                    acc = (acc
                           + win_ref[0, p, g].astype(f32).sum(axis=(1, 2))
                           [:, None]
                           + mwin_ref[0, p, g].astype(f32)
                           .sum(axis=1)[:, None]
                           + dt_ref[0, p, g] + ds_ref[0, p, g]
                           + fy_ref[0, p, g] + fx_ref[0, p, g])
                candw_ref[0, g] = acc + valid_ref[0, g]
            feat_ref[0] = jnp.broadcast_to(acc[..., None], (TB, M, F))
            return

        feat_acc = jnp.zeros((TB, M, 128), f32)
        for g in range(Mp):
            valid = valid_ref[0, g]
            Sg = jnp.zeros((TB, M, 128), f32)
            cw = jnp.ones((TB, M), f32)
            for p in range(3):
                win = win_ref[0, p, g]
                dt = dt_ref[0, p, g]
                ds = ds_ref[0, p, g]
                fy = fy_ref[0, p, g]
                fx = fx_ref[0, p, g]
                if variant != "mask":
                    if variant == "featA":
                        A4 = umask
                    else:
                        dt2 = jnp.concatenate([dt, dt], axis=1)
                        fy2 = jnp.concatenate([fy, fy], axis=1)
                        A4 = sepw(tt, dt2, fy2) * umask
                    if variant == "featD":
                        Dm = win.astype(f32).sum(axis=1)        # (TB, 128)
                        D0 = jnp.broadcast_to(Dm[:, None] + A4.sum(axis=2)
                                              [:, :M, None], (TB, M, 128))
                        D1 = D0
                    else:
                        Ab = A4.astype(jnp.bfloat16) \
                            .reshape(TB // 8, 8 * 2 * M, 128)
                        Wb = win.reshape(TB // 8, 8 * 16, 128)
                        D = jax.lax.dot_general(
                            Ab, Wb,
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=f32)
                        D = D.reshape(TB, 2 * M, 128)
                        D0 = jax.lax.slice_in_dim(D, 0, M, axis=1)
                        D1 = jax.lax.slice_in_dim(D, M, 2 * M, axis=1)
                    if variant == "featB":
                        Sg = Sg + D0 + D1
                    else:
                        Sg = Sg + D0 * sepw(q, ds, fx) \
                            + D1 * sepw(q, ds - 4.0, fx)
                if variant not in ("feat", "featA", "featD", "featB"):
                    wl = sepw(wt_i, dt, fy) * sepw(ws_i, ds, fx) \
                        * valid[..., None]
                    mw = mwin_ref[0, p, g].astype(f32)
                    lg = (wl * mw[:, None, :]).sum(axis=-1)
                    cw = cw * jax.nn.sigmoid(lg)
                elif variant == "mask":
                    Sg = Sg + jnp.broadcast_to(
                        win.astype(f32).sum(axis=1)[:, None], (TB, M, 128))
            candw_ref[0, g] = cw
            feat_acc = feat_acc + Sg * (cw * valid)[..., None]

        flat = feat_acc.reshape(TB * M, 128)
        feat_ref[0] = jax.lax.dot_general(
            flat, R, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(TB, M, F)

    def kernel_v4(win_ref, mwin_ref, dt_ref, ds_ref, fy_ref, fx_ref,
                  valid_ref, feat_ref, candw_ref):
        """v4: trailing-1 coord layout (sublane-native, no lane→sublane
        relayout per sepw), arithmetic hat weights (no compare/selects),
        s-weights as 8 static 32-lane slices of D (no (TB,M,128) B arrays,
        no final λ→f reduction matmul)."""
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

        def hat(iota_v, x):
            return jnp.maximum(0.0, 1.0 - jnp.abs(iota_v - x))

        feat_acc = jnp.zeros((TB, M, F), f32)
        for g in range(Mp):
            valid = valid_ref[0, g]                 # (TB, M, 1)
            Sg = jnp.zeros((TB, M, F), f32)
            cw = jnp.ones((TB, M, 1), f32)
            for p in range(3):
                win = win_ref[0, p, g]              # (TB, 16, 128) bf16
                dt = dt_ref[0, p, g]                # (TB, M, 1)
                ds = ds_ref[0, p, g]
                fy = fy_ref[0, p, g]
                fx = fx_ref[0, p, g]
                xt = dt + fy                        # (TB, M, 1)
                xs = ds + fx
                xt2 = jnp.concatenate([xt, xt], axis=1)   # (TB, 2M, 1)
                A4 = hat(tt, xt2) * umask
                Ab = A4.astype(jnp.bfloat16).reshape(TB // 8, 8 * 2 * M, 128)
                Wb = win.reshape(TB // 8, 8 * 16, 128)
                D = jax.lax.dot_general(
                    Ab, Wb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32)
                D = D.reshape(TB, 2 * M, 128)
                D0 = jax.lax.slice_in_dim(D, 0, M, axis=1)
                D1 = jax.lax.slice_in_dim(D, M, 2 * M, axis=1)
                # s-weights: 8 scalar hats (per member) x 32-lane D slices
                for qq in range(4):
                    b0 = hat(jnp.float32(qq), xs)        # (TB, M, 1)
                    b1 = hat(jnp.float32(qq + 4), xs)
                    Dq0 = jax.lax.slice_in_dim(D0, qq * F, (qq + 1) * F,
                                               axis=2)
                    Dq1 = jax.lax.slice_in_dim(D1, qq * F, (qq + 1) * F,
                                               axis=2)
                    Sg = Sg + Dq0 * b0 + Dq1 * b1
                # mask logit: two hat vectors over the 64-texel window
                wl = hat(wt_i, xt) * hat(ws_i, xs) * valid  # (TB, M, 64)
                mw = mwin_ref[0, p, g].astype(f32)          # (TB, 64)
                lg = (wl * mw[:, None, :]).sum(axis=-1, keepdims=True)
                cw = cw * jax.nn.sigmoid(lg)
            candw_ref[0, g] = cw
            feat_acc = feat_acc + Sg * (cw * valid)

        feat_ref[0] = feat_acc

    def build_v4():
        def im6(b, i):
            return (b, 0, 0, i, 0, 0)

        def im4(b, i):
            return (b, 0, i, 0)

        def im5c(b, i):
            return (b, 0, 0, i, 0, 0)

        spec_c = pl.BlockSpec((1, 3, Mp, TB, M, 1), im5c,
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel_v4,
            grid=(B, U // TB),
            in_specs=[pl.BlockSpec((1, 3, Mp, TB, 16, 128), im6,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 3, Mp, TB, NTEX),
                                   lambda b, i: (b, 0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
                      spec_c, spec_c, spec_c, spec_c,
                      pl.BlockSpec((1, Mp, TB, M, 1),
                                   lambda b, i: (b, 0, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, TB, M, F), im4,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, Mp, TB, M, 1),
                                    lambda b, i: (b, 0, i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((B, U, M, F), jnp.float32),
                       jax.ShapeDtypeStruct((B, Mp, U, M, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    def build(variant):
        def im6(b, i):
            return (b, 0, 0, i, 0, 0)

        def im5(b, i):
            return (b, 0, 0, i, 0)

        def im4(b, i):
            return (b, 0, i, 0)

        spec5 = lambda w: pl.BlockSpec((1, 3, Mp, TB, w), im5,  # noqa: E731
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel, variant=variant),
            grid=(B, U // TB),
            in_specs=[pl.BlockSpec((1, 3, Mp, TB, 16, 128), im6,
                                   memory_space=pltpu.VMEM),
                      spec5(NTEX), spec5(M), spec5(M), spec5(M), spec5(M),
                      pl.BlockSpec((1, Mp, TB, M), im4,
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, TB, M, F), im4,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, Mp, TB, M), im4,
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((B, U, M, F), jnp.float32),
                       jax.ShapeDtypeStruct((B, Mp, U, M), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(B, 3, Mp, U, 16, 128))
                      .astype(np.float32)).astype(jnp.bfloat16)
    np.asarray(win.astype(f32).ravel()[:1])  # sync the big transfer
    mwin = jnp.asarray(rng.normal(size=(B, 3, Mp, U, NTEX))
                       .astype(np.float32)).astype(jnp.bfloat16)
    np.asarray(mwin.astype(f32).ravel()[:1])
    dt = jnp.asarray(rng.integers(0, 7, (B, 3, Mp, U, M))
                     .astype(np.float32))
    ds = jnp.asarray(rng.integers(0, 7, (B, 3, Mp, U, M))
                     .astype(np.float32))
    fy = jnp.asarray(rng.random((B, 3, Mp, U, M)).astype(np.float32))
    fx = jnp.asarray(rng.random((B, 3, Mp, U, M)).astype(np.float32))
    valid = jnp.asarray((rng.random((B, Mp, U, M)) > 0.2)
                        .astype(np.float32))
    np.asarray(valid.ravel()[:1])

    gb = (win.size * 2 + mwin.size * 2 + (dt.size + ds.size + fy.size
                                          + fx.size + valid.size) * 4) / 1e9
    print(f"# U={U}: inputs {gb:.2f} GB, outputs "
          f"{(U*M*F*4 + Mp*U*M*4)/1e9:.2f} GB", flush=True)

    for variant in ["stream", "featA", "featD", "featB", "feat", "mask",
                    "full", "v4"]:
        if sel and variant not in sel:
            continue
        if variant == "v4":
            from enarf_gan_tpu.ops.tilewin_kernel import _hat_combine_call
            fn0 = lambda w, mw, a, b, v: _hat_combine_call(  # noqa: E731
                w, mw, a, b, v, F, clamp_mask=False, interpret=False)
            e = lambda x: x[..., None]  # noqa: E731
            args = (win, mwin, e(dt + fy), e(ds + fx), e(valid))
        else:
            fn0 = build(variant)
            args = (win, mwin, dt, ds, fy, fx, valid)
        fn = fn0
        try:
            per_op, dispatch = timeit_amortized(
                lambda *a: fn(*a)[0], *args, iters=ITERS, perturb=2)
            print(f"{variant:8s} {per_op*1e3:8.2f} ms  "
                  f"({gb/per_op:.0f} GB/s in)", flush=True)
        except Exception as e:
            print(f"{variant:8s} FAILED {type(e).__name__}: {str(e)[:3000]}",
                  flush=True)


if __name__ == "__main__":
    main()
