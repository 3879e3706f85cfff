"""Stage-by-stage timing of the DSO render hot path at bench shapes.

Each stage jitted separately, timed net of the ~25 ms host-fetch baseline.
Finds where the 1 s/frame goes (full frame = 16384 rays, Nc48+Nf64).
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
    t = (time.perf_counter() - t0) / iters
    return max(t - (BASELINE or 0.0), 1e-9)


def main():
    global BASELINE

    @jax.jit
    def null(x):
        return x.sum()

    BASELINE = timed(null, jnp.ones((8, 128)), iters=5)
    print(f"baseline fetch: {BASELINE*1e3:.1f} ms")

    key = jax.random.PRNGKey(0)
    B, K, F, ts = 1, 23, 32, 256
    n = 4096 * 48          # one coarse chunk of points
    M = 4

    pts = jax.random.uniform(key, (B, 3, n), jnp.float32, -1, 1)
    pose = jnp.tile(jnp.eye(4)[None, None], (B, K, 1, 1))
    bl = jnp.ones((B, K, 1), jnp.float32)
    planes = jax.random.normal(key, (B, (F + K) * 3, ts, ts), jnp.float32)

    # ---- stage: to_local_and_canonical-ish transforms ----
    @jax.jit
    def transforms(pts, pose, bl):
        R = pose[:, :, :3, :3]
        t = pose[:, :, :3, 3:]
        local = jnp.einsum("bkij,bkjn->bkin", jnp.swapaxes(R, -1, -2),
                           pts[:, None] - t)
        canonical = local * (1.0 / bl)[:, :, :, None]
        validity = (jnp.abs(local) <= 1).all(axis=2) \
            & (jnp.abs(canonical) < 1).all(axis=2)
        return canonical, validity

    s = timed(transforms, pts, pose, bl)
    print(f"transforms+validity einsum ({n/1e3:.0f}K pts x {K} bones): {s*1e3:8.2f} ms")
    canonical, validity = jax.jit(transforms)(pts, pose, bl)

    # ---- variant: unrolled VPU transform (channels-last, no matmul) ----
    @jax.jit
    def transforms_vpu(pts, pose, bl):
        # local[b,k,i,n] = sum_j R[b,k,j,i] * (p[b,j,n] - t[b,k,j])
        R = pose[:, :, :3, :3]
        t = pose[:, :, :3, 3]
        rel = pts[:, None, :, :] - t[..., None]            # (B,K,3,n)
        loc = [sum(R[:, :, j, i, None] * rel[:, :, j] for j in range(3))
               for i in range(3)]                           # 3 x (B,K,n)
        inv_bl = 1.0 / bl[..., 0]                           # (B,K)
        can = [l * inv_bl[..., None] for l in loc]
        validity = ((jnp.abs(loc[0]) <= 1) & (jnp.abs(loc[1]) <= 1)
                    & (jnp.abs(loc[2]) <= 1) & (jnp.abs(can[0]) < 1)
                    & (jnp.abs(can[1]) < 1) & (jnp.abs(can[2]) < 1))
        return jnp.stack(can, axis=2), validity

    s = timed(transforms_vpu, pts, pose, bl)
    print(f"transforms+validity VPU unrolled: {s*1e3:8.2f} ms")

    # ---- variant: einsum with default precision ----
    @jax.jit
    def transforms_dp(pts, pose, bl):
        R = pose[:, :, :3, :3]
        t = pose[:, :, :3, 3:]
        local = jnp.einsum("bkij,bkjn->bkin", jnp.swapaxes(R, -1, -2),
                           pts[:, None] - t,
                           precision=jax.lax.Precision.HIGHEST)
        canonical = local * (1.0 / bl)[:, :, :, None]
        validity = (jnp.abs(local) <= 1).all(axis=2) \
            & (jnp.abs(canonical) < 1).all(axis=2)
        return canonical, validity

    s = timed(transforms_dp, pts, pose, bl)
    print(f"transforms+validity einsum HIGHEST: {s*1e3:8.2f} ms")

    # ---- stage: candidate selection (top_k) ----
    from enarf_gan_tpu.ops.triplane import select_candidate_bones

    sel = jax.jit(lambda c, v: select_candidate_bones(c, v, M))
    s = timed(sel, canonical, validity)
    print(f"select_candidate_bones top_k: {s*1e3:8.2f} ms")
    cand_idx, cand_valid, cand_pos = sel(canonical, validity)

    # ---- alternative: iterative argmax candidates ----
    @jax.jit
    def sel_iter(c, v):
        cent = 1.0 - jnp.abs(c).max(axis=2)
        score = jnp.where(v, 1.0 + cent, -1.0)  # (B,K,n)
        idxs, vals = [], []
        sc = score
        for _ in range(M):
            i = jnp.argmax(sc, axis=1)          # (B,n)
            vv = jnp.max(sc, axis=1)
            idxs.append(i)
            vals.append(vv)
            sc = sc - 3.0 * jax.nn.one_hot(i, K, dtype=sc.dtype).transpose(0, 2, 1)
        return jnp.stack(idxs, -1), jnp.stack(vals, -1)

    s = timed(sel_iter, canonical, validity)
    print(f"select candidates (iter argmax): {s*1e3:8.2f} ms")

    # ---- stage: pack_rowtable ----
    from enarf_gan_tpu.ops.rowtable import pack_rowtable, sample_candidates_rowtable

    pk = jax.jit(lambda p: pack_rowtable(p, F, K, jnp.float32))
    s = timed(pk, planes)
    print(f"pack_rowtable f32: {s*1e3:8.2f} ms")
    table = pk(planes)
    print(f"  table shape {table.shape} dtype {table.dtype}")

    pk16 = jax.jit(lambda p: pack_rowtable(p, F, K, jnp.bfloat16))
    s = timed(pk16, planes)
    print(f"pack_rowtable bf16: {s*1e3:8.2f} ms")

    # ---- stage: rowtable sampling ----
    samp = jax.jit(lambda t, cp, ci, cv: sample_candidates_rowtable(
        t, cp, ci, cv, F, K, ts, ts))
    s = timed(samp, table, cand_pos, cand_idx, cand_valid)
    print(f"sample_candidates_rowtable f32 ({n/1e3:.0f}K pts x M{M}): {s*1e3:8.2f} ms")

    table16 = pk16(planes)
    s = timed(samp, table16, cand_pos, cand_idx, cand_valid)
    print(f"sample_candidates_rowtable bf16: {s*1e3:8.2f} ms")

    # ---- stage: raw take at same volume ----
    RT = int(table.shape[1])
    rows = jax.random.randint(key, (n * M * 3 * 2,), 0, RT, jnp.int32)

    @jax.jit
    def raw_take(t, r):
        return jnp.take(t[0], r, axis=0).astype(jnp.float32).sum()

    s = timed(raw_take, table, rows)
    print(f"raw take same volume ({n*M*3*2/1e6:.1f}M rows f32): {s*1e3:8.2f} ms")
    s = timed(raw_take, table16, rows)
    print(f"raw take same volume bf16: {s*1e3:8.2f} ms")

    # ---- stage: MLP heads at chunk size ----
    feat = jax.random.normal(key, (B, F, n), jnp.float32)
    w_h = jax.random.normal(key, (256, F), jnp.float32) / 6
    w_o = jax.random.normal(key, (4, 256), jnp.float32) / 16

    @jax.jit
    def heads(f, w1, w2):
        h = jax.nn.relu(jnp.einsum("hf,bfn->bhn", w1, f))
        return jnp.einsum("oh,bhn->bon", w2, h).sum()

    s = timed(heads, feat, w_h, w_o)
    print(f"toy MLP head ({n/1e3:.0f}K pts): {s*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
