"""Standalone compile+parity check of the fused combine kernel on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["ENARF_FUSED_COMBINE"] = "1"
import numpy as np
import jax, jax.numpy as jnp
from enarf_gan_tpu.ops.quadcombine import (combine_xla, _combine_pallas,
                                           fused_combine)

def main():
    key = jax.random.PRNGKey(0)
    F, M, n = 32, 4, 196608
    P = 3 * M
    g = jax.random.normal(key, (P, n, 4 * F), jnp.bfloat16)
    mw = jax.random.normal(key, (P, n, 8), jnp.float32)
    valid = (jax.random.uniform(key, (n, M)) > 0.3).astype(jnp.float32)

    fx = jax.jit(lambda *a: combine_xla(*a, F))
    fp = jax.jit(lambda *a: _combine_pallas(*a, F, False))
    t0 = time.perf_counter()
    feat_p, cw_p = fp(g, mw, valid)
    fp_ = np.asarray(feat_p)
    print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s")
    feat_x, cw_x = fx(g, mw, valid)
    np.testing.assert_allclose(fp_, np.asarray(feat_x), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cw_p), np.asarray(cw_x),
                               rtol=1e-3, atol=1e-3)
    print("parity OK")

    fps = jax.jit(lambda a, b, c: sum(
        x.sum() for x in _combine_pallas(a, b, c, F, False)))
    fxs = jax.jit(lambda a, b, c: sum(
        x.sum() for x in combine_xla(a, b, c, F)))

    def timed(fn, iters=3):
        out = fn(g, mw, valid)
        _ = np.asarray(out).ravel()[:1]
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(g, mw, valid)
            _ = np.asarray(out).ravel()[:1]
        return (time.perf_counter() - t0) / iters
    base = timed(jax.jit(lambda a, b, c: a.sum()))
    print(f"baseline {base*1e3:.1f} ms")
    print(f"pallas: {max(timed(fps)-base,0)*1e3:8.2f} ms")
    print(f"xla:    {max(timed(fxs)-base,0)*1e3:8.2f} ms")

if __name__ == "__main__":
    main()
