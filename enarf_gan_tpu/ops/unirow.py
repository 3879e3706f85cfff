"""Unirow tri-plane sampling — single-fetch fused rows (v4 TPU fast path).

Replaces ops/quadtable.py's TWO gathers per (point, candidate, plane) — a
128-lane feature-quad row plus a 4-lane bone-folded mask row — with ONE
256-lane bf16 row that carries both:

    [ A_f | B_f | C_f | D_f | A_m(32) | B_m(32) | C_m(32) | D_m(32) ]

where A..D are the 2x2 bilinear texel quad of cell (t, s) and each mask
corner block holds that texel's mask logit for ALL bones (bone k at lane
offset k, K <= 32); the candidate's bone is selected by a one-hot over the
32-lane block at combine time instead of being folded into the row index.

Why (measured, tools/bench_rowwidth.py, TPU v5e): XLA row gathers are
ISSUE-bound at ~380-400 M rows/s for rows up to 128 lanes and still run at
245 M rows/s for 256-lane bf16 rows (125 GB/s) — so one 256-lane fetch
(4.1 ms/M rows) decisively beats a 128-lane + a narrow fetch
(2.6 + 2.5 ms/M). The mask no longer multiplies the table by K either:
the packed table is (B, 3*(H+1)*(W+1), 4F+128) ≈ 100 MB at 256², and is
built once per frame (models/narf.py::pack_planes).

The combine (bilinear lane arithmetic + bone select + sigmoid-prod +
weighted feature sum) runs as a custom-VJP XLA graph BY DEFAULT — a
Pallas combine kernel exists but measured SLOWER than XLA on the
lane-sliced 256-wide reads (PERF.md), so it stays opt-in behind
``ENARF_UNIROW_COMBINE=pallas`` for probes. Gradients flow through the
combine's hand-derived VJP and natively through the gather and
``pack_unirow`` (plain pad/concat/astype ops), so the whole path trains.

Reference equivalents: libraries/triplane/sampling.py:54-127 and
cuda_extension/TriplaneSampler_kernel.cu:37-92 (fused gather-sum with
``align_corners=False`` + zeros padding).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from enarf_gan_tpu.ops.activation import straight_through_clamp
from enarf_gan_tpu.ops.quadtable import _quad_cells_weights

MASK_BLOCK = 32          # lanes per mask corner block (bones 0..K-1, K<=32)
_BLK = 512               # pallas block along the point axis
# points per pallas invocation: XLA stages each call's full outputs
# (double-buffered) AND its small non-table operands on the 16 MB
# scoped-vmem stack (S(1)), so one big call OOMs at compile — measured
# 42.3 MB for a 196K-point call with a (n, F) feature output (the F=32
# minor axis pads to 128 lanes, 4x). Keeping the point axis minor
# ((F, n) output) plus a static loop of 16K-point calls stays ~9 MB.
_CHUNK = 16384


def row_width(feat_dim: int) -> int:
    return 4 * feat_dim + 4 * MASK_BLOCK


def pack_unirow(tri_plane_feature: jnp.ndarray, feat_dim: int,
                num_bone: int) -> jnp.ndarray:
    """(B, (F+K)*3, H, W) planes → (B, 3*(H+1)*(W+1), 4F+128) bf16 table.

    Row r = p*(H+1)*(W+1) + t*(W+1) + s for plane p, cell (t, s); zeros out
    of bounds (grid_sample zero padding). Channel layout of the input
    follows the model: F*3 feature planes then K*3 per-bone mask planes
    (reference models/narf.py:71).
    """
    from enarf_gan_tpu.ops.quadtable import quad_pack_corners
    B, C3, H, W = tri_plane_feature.shape
    F, K = feat_dim, num_bone
    assert C3 == (F + K) * 3, (C3, F, K)
    assert K <= MASK_BLOCK, K

    feat = tri_plane_feature[:, :F * 3].reshape(B, 3, F, H, W) \
        .transpose(0, 1, 3, 4, 2)                              # (B,3,H,W,F)
    mask = tri_plane_feature[:, F * 3:].reshape(B, K, 3, H, W) \
        .transpose(0, 2, 3, 4, 1)                              # (B,3,H,W,K)
    fq = quad_pack_corners(feat)                               # (…, 4F)
    mq = quad_pack_corners(mask).reshape(B, 3, -1, 4, K)
    mq = jnp.pad(mq, ((0, 0),) * 3 + ((0, 0), (0, MASK_BLOCK - K)))
    mq = mq.reshape(B, 3, fq.shape[2], 4 * MASK_BLOCK)
    table = jnp.concatenate([fq, mq], axis=-1).astype(jnp.bfloat16)
    return table.reshape(B, 3 * fq.shape[2], row_width(F))


def _combine_xla(g, wq4, cand_idx, cand_valid_f, feat_dim, clamp_mask):
    """Reference combine: g (B,3,M,n,4F+128) bf16 → feature (B,F,n)/cand_w.

    Pure jnp; used on CPU, for tests, and as the custom-VJP recompute
    skeleton. Keeps n minor throughout (PERF.md layout rule).
    """
    F = feat_dim
    B, _, M, n, _ = g.shape
    feat = sum(g[..., q * F:(q + 1) * F]
               * wq4[:, q][:, :, :, :, None].astype(g.dtype)
               for q in range(4))
    feat = feat.astype(jnp.float32).sum(axis=1)               # (B, M, n, F)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (B, M, n, MASK_BLOCK), 3)
          == cand_idx[..., None]).astype(jnp.float32)         # (B, M, n, 32)
    base = 4 * F
    logit = sum(
        (g[..., base + q * MASK_BLOCK: base + (q + 1) * MASK_BLOCK]
         .astype(jnp.float32) * oh[:, None]).sum(axis=-1) * wq4[:, q]
        for q in range(4))                                    # (B, 3, M, n)
    if clamp_mask:
        logit = straight_through_clamp(logit)
    cand_wn = jax.nn.sigmoid(logit).prod(axis=1)              # (B, M, n)
    w = cand_wn * cand_valid_f                                # (B, M, n)
    feature = jnp.einsum("bmnf,bmn->bfn", feat, w)            # (B, F, n)
    return feature, cand_wn


def _combine_kernel(g_ref, wq_ref, idx_ref, valid_ref, feat_ref, cw_ref, *,
                    feat_dim: int, clamp_mask: bool):
    F = feat_dim
    g = g_ref[0]                                  # (3, M, BLK, 4F+128) bf16
    wq = wq_ref[0].astype(jnp.float32)            # (4, 3, M, BLK)
    idx = idx_ref[0]                              # (M, BLK) int32
    valid = valid_ref[0].astype(jnp.float32)      # (M, BLK)
    _, M, BLK, _ = g.shape

    feat = None
    for q in range(4):
        fq = g[..., q * F:(q + 1) * F].astype(jnp.float32)  # (3,M,BLK,F)
        t = fq * wq[q][..., None]
        feat = t if feat is None else feat + t
    feat = feat.sum(axis=0)                                  # (M, BLK, F)

    oh = (jax.lax.broadcasted_iota(jnp.int32, (M, BLK, MASK_BLOCK), 2)
          == idx[..., None]).astype(jnp.float32)             # (M, BLK, 32)
    base = 4 * F
    logit = None
    for q in range(4):
        mq = g[..., base + q * MASK_BLOCK: base + (q + 1) * MASK_BLOCK]
        sel = (mq.astype(jnp.float32) * oh[None]).sum(axis=-1)  # (3,M,BLK)
        t = sel * wq[q]
        logit = t if logit is None else logit + t
    if clamp_mask:
        logit = jnp.clip(logit, -2.0, 5.0)
    sig = jax.nn.sigmoid(logit)
    cw = sig[0] * sig[1] * sig[2]       # (M, BLK); Mosaic lacks reduce_prod
    w = cw * valid
    wf = (feat * w[..., None]).sum(axis=0)                   # (BLK, F)
    feat_ref[0] = wf.T                                       # (F, BLK)
    cw_ref[0] = cw


def _combine_pallas(g, wq4, cand_idx, cand_valid_f, feat_dim, clamp_mask):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, _, M, n, RW = g.shape
    F = feat_dim
    step = min(_CHUNK, ((n + _BLK - 1) // _BLK) * _BLK)
    pad = (-n) % step
    if pad:
        g = jnp.pad(g, ((0, 0),) * 3 + ((0, pad), (0, 0)))
        wq4 = jnp.pad(wq4, ((0, 0),) * 4 + ((0, pad),))
        cand_idx = jnp.pad(cand_idx, ((0, 0), (0, 0), (0, pad)))
        cand_valid_f = jnp.pad(cand_valid_f, ((0, 0), (0, 0), (0, pad)))
    npad = n + pad

    def call(gc, wc, ic, vc):
        grid = (B, step // _BLK)
        return pl.pallas_call(
            partial(_combine_kernel, feat_dim=F, clamp_mask=clamp_mask),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3, M, _BLK, RW),
                             lambda b, i: (b, 0, 0, i, 0)),
                pl.BlockSpec((1, 4, 3, M, _BLK),
                             lambda b, i: (b, 0, 0, 0, i)),
                pl.BlockSpec((1, M, _BLK), lambda b, i: (b, 0, i)),
                pl.BlockSpec((1, M, _BLK), lambda b, i: (b, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, F, _BLK), lambda b, i: (b, 0, i)),
                pl.BlockSpec((1, M, _BLK), lambda b, i: (b, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, F, step), jnp.float32),
                jax.ShapeDtypeStruct((B, M, step), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                # Mosaic charges a ~42 MB constant to this kernel's scoped
                # stack (lane-sliced 256-wide rows); v5e has 128 MB VMEM and
                # nothing else contends within the op, so raise the 16 MB
                # default rather than shrink blocks further
                vmem_limit_bytes=100 * 1024 * 1024),
        )(gc, wc, ic, vc)

    feats, cws = [], []
    for s in range(0, npad, step):  # static unroll: n is trace-static
        f, c = call(g[:, :, :, s:s + step], wq4[..., s:s + step],
                    cand_idx[..., s:s + step], cand_valid_f[..., s:s + step])
        feats.append(f)
        cws.append(c)
    feature = jnp.concatenate(feats, axis=2) if len(feats) > 1 else feats[0]
    cw = jnp.concatenate(cws, axis=2) if len(cws) > 1 else cws[0]
    return feature[:, :, :n], cw[:, :, :n]


def _use_pallas() -> bool:
    # default = XLA: measured on TPU v5e (tools/bench_unirow_vs_quad.py),
    # the XLA combine beats the Pallas combine (which compiles with the
    # vmem_limit_bytes raise but loses on the lane-sliced 256-wide reads);
    # unirow+XLA is the overall winner at 22.4 ms vs quadtable's 35.2 ms
    # for the bench workload. Pallas path kept behind the env for probes.
    return os.environ.get("ENARF_UNIROW_COMBINE") == "pallas"


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _unirow_combine(g, wq4, cand_idx, cand_valid_f, feat_dim, clamp_mask):
    """feature (B,F,n) f32, cand_w (B,M,n) f32 from gathered unirow rows.

    Args: g (B,3,M,n,4F+128) bf16; wq4 (B,4,3,M,n) f32 bilinear corner
    weights; cand_idx (B,M,n) int32; cand_valid_f (B,M,n) f32.
    """
    if _use_pallas():
        return _combine_pallas(g, wq4, cand_idx, cand_valid_f, feat_dim,
                               clamp_mask)
    return _combine_xla(g, wq4, cand_idx, cand_valid_f, feat_dim, clamp_mask)


def _combine_fwd(g, wq4, cand_idx, cand_valid_f, feat_dim, clamp_mask):
    out = _unirow_combine(g, wq4, cand_idx, cand_valid_f, feat_dim,
                          clamp_mask)
    return out, (g, wq4, cand_idx, cand_valid_f)


def _combine_bwd(feat_dim, clamp_mask, res, cot):
    """Hand VJP (XLA): recompute intermediates once, emit dg/dwq4/dvalid.

    straight_through_clamp contributes identity to dlogit (ops/activation.py)
    but the sigmoid and its derivative are still evaluated at the CLAMPED
    logit, so the recompute must clamp before sigmoid.
    """
    g, wq4, cand_idx, cand_valid_f = res
    dfeature, dcw_out = cot
    F = feat_dim
    B, _, M, n, _ = g.shape
    base = 4 * F

    # recompute forward intermediates
    featq = [g[..., q * F:(q + 1) * F].astype(jnp.float32) for q in range(4)]
    wq = [wq4[:, q] for q in range(4)]                       # (B,3,M,n) each
    feat = sum(fq * w[..., None] for fq, w in zip(featq, wq))  # (B,3,M,n,F)
    feat_pm = feat.sum(axis=1)                               # (B,M,n,F)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (B, M, n, MASK_BLOCK), 3)
          == cand_idx[..., None]).astype(jnp.float32)
    mq = [g[..., base + q * MASK_BLOCK: base + (q + 1) * MASK_BLOCK]
          .astype(jnp.float32) for q in range(4)]
    selq = [(m * oh[:, None]).sum(axis=-1) for m in mq]      # (B,3,M,n)
    logit = sum(s * w for s, w in zip(selq, wq))
    if clamp_mask:
        logit = jnp.clip(logit, -2.0, 5.0)
    sig = jax.nn.sigmoid(logit)                              # (B,3,M,n)
    cw = sig.prod(axis=1)                                    # (B,M,n)

    # backward (dfeature arrives point-minor: (B,F,n))
    w_pt = cw * cand_valid_f                                 # (B,M,n)
    dw_pt = jnp.einsum("bfn,bmnf->bmn", dfeature, feat_pm)
    dfeat_pm = (w_pt[..., None]
                * dfeature.transpose(0, 2, 1)[:, None])      # (B,M,n,F)
    dcw = dw_pt * cand_valid_f + dcw_out                     # (B,M,n)
    dvalid = dw_pt * cw
    dlogit = dcw[:, None] * cw[:, None] * (1.0 - sig)        # (B,3,M,n)

    dwq4 = [jnp.einsum("bpmnf,bmnf->bpmn", featq[q], dfeat_pm)
            + selq[q] * dlogit for q in range(4)]
    # dg feature lanes: broadcast dfeat_pm over planes, scale by wq[q]
    dg_feat = jnp.concatenate(
        [(wq[q][..., None] * dfeat_pm[:, None]).astype(g.dtype)
         for q in range(4)], axis=-1)                        # (B,3,M,n,4F)
    dg_mask = jnp.concatenate(
        [((dlogit * wq[q])[..., None] * oh[:, None]).astype(g.dtype)
         for q in range(4)], axis=-1)                        # (B,3,M,n,128)
    dg = jnp.concatenate([dg_feat, dg_mask], axis=-1)
    dwq4 = jnp.stack(dwq4, axis=1)                           # (B,4,3,M,n)
    return dg, dwq4, None, dvalid


_unirow_combine.defvjp(_combine_fwd, _combine_bwd)


def sample_candidates_unirow(
        table: jnp.ndarray, cand_pos: jnp.ndarray, cand_idx: jnp.ndarray,
        cand_valid: jnp.ndarray, feat_dim: int, num_bone: int, H: int, W: int,
        clamp_mask: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused part-prob + weighted-feature sampling, one fetch per
    (point, candidate, plane).

    Args:
        table: (B, 3*(H+1)*(W+1), 4F+128) bf16 from ``pack_unirow``.
        cand_pos: (B, n, M, 3); cand_idx: (B, n, M) int32 bone ids;
        cand_valid: (B, n, M) bool.
    Returns:
        (feature (B, F, n) f32, cand_w (B, n, M) f32) — same contract as
        ops/quadtable.py::sample_candidates_quadtable.
    """
    B, n, M, _ = cand_pos.shape
    F = feat_dim
    HpWp = (H + 1) * (W + 1)
    cp = cand_pos.transpose(0, 3, 2, 1)                    # (B, 3, M, n)
    cells, wq = _quad_cells_weights(cp, H, W)              # (B, 3, M, n)
    plane = jnp.arange(3, dtype=jnp.int32).reshape(1, 3, 1, 1)
    R = table.shape[1]
    rows = (plane * HpWp + cells
            + (jnp.arange(B, dtype=jnp.int32) * R).reshape(B, 1, 1, 1))
    g = jnp.take(table.reshape(B * R, table.shape[-1]), rows.reshape(-1),
                 axis=0).reshape(B, 3, M, n, table.shape[-1])

    wq4 = jnp.stack(wq, axis=1)                            # (B, 4, 3, M, n)
    ci = cand_idx.transpose(0, 2, 1)                       # (B, M, n)
    cv = cand_valid.transpose(0, 2, 1).astype(jnp.float32)
    feature, cand_wn = _unirow_combine(g, wq4, ci, cv, F, clamp_mask)
    return feature, cand_wn.transpose(0, 2, 1)
