"""Break density_color into sub-stages on the real TPU (scalar-out)."""
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

    pts = jax.random.uniform(key, (B, 3, n), jnp.float32, -1, 1)
    pose = jnp.tile(jnp.eye(4)[None, None], (B, K, 1, 1))
    bl = jnp.ones((B, K, 1), jnp.float32)
    planes = jax.random.normal(key, (B, (F + K) * 3, ts, ts), jnp.float32)
    canon44 = jnp.tile(jnp.eye(4)[None], (K, 1, 1))

    # (a) to_local_and_canonical + validity
    @jax.jit
    def stage_a(pts, pose, bl):
        R = pose[:, :, :3, :3]
        t = pose[:, :, :3, 3:]
        local = jnp.einsum("bkij,bkjn->bkin", jnp.swapaxes(R, -1, -2),
                           pts[:, None] - t,
                           precision=jax.lax.Precision.HIGHEST)
        scale = (jnp.ones(K)[None, :, None] / bl / 3.0)
        canonical = local * scale[:, :, :, None]
        cR = canon44[:, :3, :3]
        ct = canon44[:, :3, 3:]
        canonical = jnp.einsum("kij,bkjn->bkin", cR, canonical,
                               precision=jax.lax.Precision.HIGHEST) + ct[None]
        validity = (jnp.abs(local) <= 1).all(axis=2) \
            & (jnp.abs(canonical) < 1).all(axis=2)
        return canonical.sum() + validity.sum()

    print(f"(a) to_local_and_canonical: {timed(stage_a, pts, pose, bl)*1e3:8.2f} ms",
          flush=True)

    @jax.jit
    def mk_can(pts, pose, bl):
        R = pose[:, :, :3, :3]
        t = pose[:, :, :3, 3:]
        local = jnp.einsum("bkij,bkjn->bkin", jnp.swapaxes(R, -1, -2),
                           pts[:, None] - t,
                           precision=jax.lax.Precision.HIGHEST)
        canonical = local / 3.0
        validity = (jnp.abs(local) <= 1).all(axis=2) \
            & (jnp.abs(canonical) < 1).all(axis=2)
        return canonical, validity

    canonical, validity = mk_can(pts, pose, bl)

    # (b) candidate selection
    from enarf_gan_tpu.ops.triplane import select_candidate_bones

    @jax.jit
    def stage_b(c, v):
        r = select_candidate_bones(c, v, M)
        return sum(x.sum() for x in r)

    print(f"(b) select_candidate_bones: {timed(stage_b, canonical, validity)*1e3:8.2f} ms",
          flush=True)
    ci, cv, cp = jax.jit(lambda c, v: select_candidate_bones(c, v, M))(
        canonical, validity)

    # (c) quad sampling
    from enarf_gan_tpu.ops.quadtable import pack_quadtable, sample_candidates_quadtable
    for dt, dn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        tables = jax.jit(lambda p: pack_quadtable(p, F, K, dt))(planes)

        @jax.jit
        def stage_c(tables, cp, ci, cv):
            f, w = sample_candidates_quadtable(tables, cp, ci, cv, F, K, ts, ts)
            return f.sum() + w.sum()

        print(f"(c) sample_candidates_quadtable {dn}: "
              f"{timed(stage_c, tables, cp, ci, cv)*1e3:8.2f} ms", flush=True)

    # (d) heads (StyledMLP from the model)
    from enarf_gan_tpu.nn.layers import StyledMLP, StyledConv1d
    feature = jax.random.normal(key, (B, F, n), jnp.float32)
    z = jax.random.normal(key, (B, 20), jnp.float32)

    class Heads:
        pass

    import flax.linen as nn

    class H(nn.Module):
        @nn.compact
        def __call__(self, f, z):
            cd = StyledMLP(64, 4, style_dim=20)(f, z)
            return jnp.tanh(cd[:, :3]).sum() + cd[:, 3:].sum()

    h = H()
    vs = h.init(key, feature, z)
    jh = jax.jit(lambda vs, f, z: h.apply(vs, f, z))
    print(f"(d) StyledMLP head (196K pts): {timed(jh, vs, feature, z)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
