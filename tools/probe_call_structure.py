"""Bisect WHICH pallas_call structure triggers the broken chipless-AOT
remote-compile path (tools/probe_kernel_stages.py: even a minimal kernel
fails in 2 s, while every single-op probe in bisect_kernel_ops compiles).

Variants add one structural feature at a time on a trivial kernel body.
"""
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

    TB, M, Mp, NTEX = 128, 16, 4, 64
    B, U = 1, TB
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(B, 3, Mp, U, 16, 128))
                      .astype(np.float32).astype(jnp.bfloat16))
    mwin = jnp.asarray(rng.normal(size=(B, 3, Mp, U, NTEX))
                       .astype(np.float32).astype(jnp.bfloat16))
    sm = jnp.asarray(rng.random((B, 3, Mp, U, M)).astype(np.float32))
    valid = jnp.asarray(rng.random((B, Mp, U, M)).astype(np.float32))

    def im6(b, i):
        return (b, 0, 0, i, 0, 0)

    def im5(b, i):
        return (b, 0, 0, i, 0)

    def im4(b, i):
        return (b, 0, i, 0)

    spec6 = pl.BlockSpec((1, 3, Mp, TB, 16, 128), im6,
                         memory_space=pltpu.VMEM)
    spec5 = lambda w: pl.BlockSpec((1, 3, Mp, TB, w), im5,  # noqa: E731
                                   memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((1, Mp, TB, M), im4, memory_space=pltpu.VMEM)
    out4 = pl.BlockSpec((1, TB, M, 32), im4, memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, U, M, 32), jnp.float32)
    oshape2 = jax.ShapeDtypeStruct((B, Mp, U, M), jnp.float32)

    def run(name, kern, in_specs, out_specs, out_shape, args):
        t0 = time.perf_counter()
        try:
            call = pl.pallas_call(kern, grid=(B, U // TB), in_specs=in_specs,
                                  out_specs=out_specs, out_shape=out_shape)
            f = jax.jit(lambda *a: sum(
                x.sum() for x in jax.tree_util.tree_leaves(call(*a))))
            v = float(np.asarray(f(*args)))
            print(f"{name:22s} OK   {time.perf_counter()-t0:5.1f}s "
                  f"chk={v:.3e}", flush=True)
            return True
        except Exception as e:
            print(f"{name:22s} FAIL {time.perf_counter()-t0:5.1f}s "
                  f"{str(e)[:120]}", flush=True)
            return False

    # 1: 6D in, one 4D out
    def k1(w_ref, o_ref):
        o_ref[0] = w_ref[0, 0, 0].astype(jnp.float32)[:, :M, :32]
    run("6d_in_1out", k1, [spec6], out4, oshape, (win,))

    # 2: 6D + 5D ins, one out
    def k2(w_ref, m_ref, o_ref):
        o_ref[0] = (w_ref[0, 0, 0].astype(jnp.float32)[:, :M, :32]
                    + m_ref[0, 0, 0].astype(jnp.float32)[:, :M, :32])
    run("6d_5d_1out", k2, [spec6, spec5(NTEX)], out4, oshape, (win, mwin))

    # 3: two outs (4D each)
    def k3(w_ref, o_ref, o2_ref):
        o_ref[0] = w_ref[0, 0, 0].astype(jnp.float32)[:, :M, :32]
        o2_ref[0] = w_ref[0, :, :, :, 0, :M].astype(jnp.float32).sum(axis=0)
    run("6d_2out", k3, [spec6], [out4, spec4], [oshape, oshape2], (win,))

    # 4: full input roster, 1 out
    def k4(w_ref, m_ref, a_ref, b_ref, c_ref, d_ref, v_ref, o_ref):
        o_ref[0] = (w_ref[0, 0, 0].astype(jnp.float32)[:, :M, :32]
                    + a_ref[0, 0, 0][..., None] + v_ref[0, 0][..., None])
    run("7in_1out", k4, [spec6, spec5(NTEX)] + [spec5(M)] * 4 + [spec4],
        out4, oshape, (win, mwin, sm, sm, sm, sm, valid))

    # 5: full roster, 2 outs (the real call structure, trivial body)
    def k5(w_ref, m_ref, a_ref, b_ref, c_ref, d_ref, v_ref, o_ref, o2_ref):
        o_ref[0] = (w_ref[0, 0, 0].astype(jnp.float32)[:, :M, :32]
                    + a_ref[0, 0, 0][..., None])
        o2_ref[0] = v_ref[0] * 2.0
    run("7in_2out", k5, [spec6, spec5(NTEX)] + [spec5(M)] * 4 + [spec4],
        [out4, spec4], [oshape, oshape2],
        (win, mwin, sm, sm, sm, sm, valid))


if __name__ == "__main__":
    main()
