"""Stage-bisect the tilewin v2 kernel's slow Mosaic compile on chip.

Builds cut-down versions of _combine_kernel (same block shapes) with
stages toggled by env:
  NPLANES (default 3)   planes unrolled
  NG      (default 4)   Mp slots unrolled
  MASK=0               skip the mask-logit/sigmoid branch
  MASKDOT=1            mask logit via batched dot_general instead of
                       broadcast-multiply + lane reduce
  FEAT=0               skip the feature dot branch
  FINAL=0              skip the final reshape+dot projection
Each full-kernel compile that exceeds the remote service's ~45 s budget
falls into a broken chipless-AOT helper, so compile time IS the failure.
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

    TB, M, WIN, NTEX, F = 128, 16, 8, 64, 32
    P = int(os.environ.get("NPLANES", 3))
    NG = int(os.environ.get("NG", 4))
    MASK = os.environ.get("MASK", "1") == "1"
    MASKDOT = os.environ.get("MASKDOT", "0") == "1"
    DOT = os.environ.get("DOT", "1") == "1"
    FEAT = os.environ.get("FEAT", "1") == "1"
    FINAL = os.environ.get("FINAL", "1") == "1"
    Mp = 4
    B, U = 1, TB
    f32 = jnp.float32

    def kern(win_ref, mwin_ref, dt_ref, ds_ref, fy_ref, fx_ref,
             valid_ref, feat_ref, candw_ref):
        sig = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 16), 2)
        tt = (sig // 2).astype(f32)
        par = (sig % 2).astype(f32)
        half = (jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 16), 1)
                // M).astype(f32)
        q = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, 128), 2)
             // F).astype(f32)
        wt_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                // WIN).astype(f32)
        ws_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
                % WIN).astype(f32)
        lam = jax.lax.broadcasted_iota(jnp.int32, (128, F), 0)
        ff = jax.lax.broadcasted_iota(jnp.int32, (128, F), 1)
        R = (lam % F == ff).astype(f32)

        def sepw(iota_v, d, frac):
            d = d[..., None]
            frac = frac[..., None]
            return (jnp.where(iota_v == d, 1.0 - frac, 0.0)
                    + jnp.where(iota_v == d + 1.0, frac, 0.0))

        feat_acc = jnp.zeros((TB, M, 128), f32)
        for g in range(NG):
            valid = valid_ref[0, g]
            Sg = jnp.zeros((TB, M, 128), f32)
            cw = jnp.ones((TB, M), f32)
            for p in range(P):
                win = win_ref[0, p, g]
                dt = dt_ref[0, p, g]
                ds = ds_ref[0, p, g]
                fy = fy_ref[0, p, g]
                fx = fx_ref[0, p, g]
                if FEAT:
                    dt2 = jnp.concatenate([dt, dt], axis=1)
                    fy2 = jnp.concatenate([fy, fy], axis=1)
                    v2 = jnp.concatenate([valid, valid], axis=1)
                    A = sepw(tt, dt2, fy2) * (par == half) * v2[..., None]
                    if DOT:
                        D = jax.lax.dot_general(
                            A.astype(jnp.bfloat16), win,
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=f32)
                        D0, D1 = D[:, :M], D[:, M:]
                    else:
                        winf = win.astype(f32)
                        D0 = (A[:, :M, :, None]
                              * winf[:, None]).sum(axis=2)
                        D1 = (A[:, M:, :, None]
                              * winf[:, None]).sum(axis=2)
                    B0 = sepw(q, ds, fx)
                    B1 = sepw(q, ds - 4.0, fx)
                    Sg = Sg + D0 * B0 + D1 * B1
                if MASK:
                    wl = sepw(wt_i, dt, fy) * sepw(ws_i, ds, fx) \
                        * valid[..., None]
                    mw = mwin_ref[0, p, g]
                    if MASKDOT:
                        lg = jax.lax.dot_general(
                            wl.astype(jnp.bfloat16), mw[..., None],
                            dimension_numbers=(((2,), (1,)),
                                               ((0,), (0,))),
                            preferred_element_type=f32)[..., 0]
                    else:
                        lg = (wl * mw.astype(f32)[:, None, :]).sum(axis=-1)
                    cw = cw * jax.nn.sigmoid(lg)
            candw_ref[0, g] = cw
            feat_acc = feat_acc + Sg * (cw * valid)[..., None]

        if FINAL:
            flat = feat_acc.reshape(TB * M, 128)
            feat_ref[0] = jax.lax.dot_general(
                flat, R, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(TB, M, F)
        else:
            feat_ref[0] = feat_acc[..., :F]

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(B, 3, Mp, U, 16, 128))
                      .astype(np.float32).astype(jnp.bfloat16))
    mwin = jnp.asarray(rng.normal(size=(B, 3, Mp, U, NTEX))
                       .astype(np.float32).astype(jnp.bfloat16))
    dt = jnp.asarray(rng.integers(0, 7, (B, 3, Mp, U, M)).astype(np.float32))
    ds = jnp.asarray(rng.integers(0, 7, (B, 3, Mp, U, M)).astype(np.float32))
    fy = jnp.asarray(rng.random((B, 3, Mp, U, M)).astype(np.float32))
    fx = jnp.asarray(rng.random((B, 3, Mp, U, M)).astype(np.float32))
    valid = jnp.asarray((rng.random((B, Mp, U, M)) > 0.2).astype(np.float32))

    def im6(b, i):
        return (b, 0, 0, i, 0, 0)

    def im5(b, i):
        return (b, 0, 0, i, 0)

    def im4(b, i):
        return (b, 0, i, 0)

    spec5 = lambda w: pl.BlockSpec((1, 3, Mp, TB, w), im5,  # noqa: E731
                                   memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
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
                   jax.ShapeDtypeStruct((B, Mp, U, M), jnp.float32)])
    f = jax.jit(lambda *a: [x.sum() for x in call(*a)])
    tag = f"P{P} NG{NG} mask{int(MASK)} feat{int(FEAT)} final{int(FINAL)}"
    t0 = time.perf_counter()
    try:
        out = f(win, mwin, dt, ds, fy, fx, valid)
        vals = [float(np.asarray(x)) for x in out]
        print(f"{tag}: OK {time.perf_counter()-t0:.1f}s chk={vals}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {time.perf_counter()-t0:.1f}s "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
