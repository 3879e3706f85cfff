"""Stage timing v2 — every stage reduced to a scalar in-graph so the ~25 ms
host round-trip (55 MB/s tunnel!) doesn't pollute measurements.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

BASELINE = None


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return max((time.perf_counter() - t0) / iters - (BASELINE or 0), 1e-9)


def main():
    global BASELINE
    key = jax.random.PRNGKey(0)

    @jax.jit
    def null(x):
        return x.sum()

    BASELINE = timed(null, jnp.ones((8, 128)), iters=5)
    print(f"baseline: {BASELINE*1e3:.1f} ms", flush=True)

    B, K, F, ts, M = 1, 23, 32, 256, 4
    n = 4096 * 48

    pts = jax.random.uniform(key, (B, 3, n), jnp.float32, -1, 1)
    pose = jnp.tile(jnp.eye(4)[None, None], (B, K, 1, 1))
    bl = jnp.ones((B, K, 1), jnp.float32)
    planes = jax.random.normal(key, (B, (F + K) * 3, ts, ts), jnp.float32)

    @jax.jit
    def transforms(pts, pose, bl):
        R = pose[:, :, :3, :3]
        t = pose[:, :, :3, 3:]
        local = jnp.einsum("bkij,bkjn->bkin", jnp.swapaxes(R, -1, -2),
                           pts[:, None] - t,
                           precision=jax.lax.Precision.HIGHEST)
        canonical = local * (1.0 / bl)[:, :, :, None]
        validity = (jnp.abs(local) <= 1).all(axis=2) \
            & (jnp.abs(canonical) < 1).all(axis=2)
        return canonical.sum() + validity.sum()

    s = timed(transforms, pts, pose, bl)
    print(f"transforms+validity (scalar out): {s*1e3:8.2f} ms", flush=True)

    @jax.jit
    def transforms_full(pts, pose, bl):
        R = pose[:, :, :3, :3]
        t = pose[:, :, :3, 3:]
        local = jnp.einsum("bkij,bkjn->bkin", jnp.swapaxes(R, -1, -2),
                           pts[:, None] - t,
                           precision=jax.lax.Precision.HIGHEST)
        canonical = local * (1.0 / bl)[:, :, :, None]
        validity = (jnp.abs(local) <= 1).all(axis=2) \
            & (jnp.abs(canonical) < 1).all(axis=2)
        return canonical, validity

    canonical, validity = transforms_full(pts, pose, bl)
    canonical = jax.device_put(canonical)
    validity = jax.device_put(validity)

    from enarf_gan_tpu.ops.triplane import select_candidate_bones

    sel = jax.jit(lambda c, v: jax.tree_util.tree_map(
        lambda x: x.sum(), select_candidate_bones(c, v, M)))
    s = timed(sel, canonical, validity)
    print(f"select_candidate_bones (scalar out): {s*1e3:8.2f} ms", flush=True)

    sel_full = jax.jit(lambda c, v: select_candidate_bones(c, v, M))
    cand_idx, cand_valid, cand_pos = sel_full(canonical, validity)

    from enarf_gan_tpu.ops.rowtable import pack_rowtable, sample_candidates_rowtable

    pk = jax.jit(lambda p: pack_rowtable(p, F, K, jnp.float32).sum())
    s = timed(pk, planes)
    print(f"pack_rowtable f32 (scalar out): {s*1e3:8.2f} ms", flush=True)

    table = jax.jit(lambda p: pack_rowtable(p, F, K, jnp.float32))(planes)

    samp = jax.jit(lambda t, cp, ci, cv: sum(
        x.sum() for x in sample_candidates_rowtable(t, cp, ci, cv, F, K, ts, ts)))
    s = timed(samp, table, cand_pos, cand_idx, cand_valid)
    print(f"sample_candidates_rowtable (scalar out): {s*1e3:8.2f} ms", flush=True)

    # full model density_color at chunk shape
    from enarf_gan_tpu.models.narf import NARFParams, TriPlaneNARF
    params = NARFParams(Nc=48, Nf=64, hidden_size=256, tri_plane_size=256,
                        coordinate_scale=3.0, view_dependent=False,
                        origin_location="center_fixed",
                        deformation_field=True, time_conditional=True)
    model = TriPlaneNARF(params=params, z_dim=256, z2_dim=256, num_bone=K,
                        parent_id=tuple(range(-1, K - 1)))

    z = jax.random.normal(key, (B, 256))
    pose44 = jnp.tile(jnp.eye(4)[None, None], (B, K + 1, 1, 1))

    # init via the public apply path is heavy; time only the pieces we can
    # reach without full generator wiring — skip if init fails.
    try:
        variables = model.init(key, pts[:, :, :100], pose, bl, z, z,
                               method=None)
        print("model init ok", flush=True)
    except Exception as e:
        print(f"(model init skipped: {type(e).__name__} {str(e)[:120]})",
              flush=True)

    # heads at chunk size: StyledMLP-ish stack 32->256->256->4
    feat = jax.random.normal(key, (B, F, n), jnp.float32)
    Ws = [jax.random.normal(key, (256, F)) * 0.1,
          jax.random.normal(key, (256, 256)) * 0.06,
          jax.random.normal(key, (4, 256)) * 0.06]

    @jax.jit
    def headstack(f, W1, W2, W3):
        h = jax.nn.relu(jnp.einsum("hf,bfn->bhn", W1, f))
        h = jax.nn.relu(jnp.einsum("gh,bhn->bgn", W2, h))
        return jnp.einsum("og,bgn->bon", W3, h).sum()

    s = timed(headstack, feat, *Ws)
    print(f"3-layer head 32-256-256-4 ({n/1e3:.0f}K pts): {s*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
