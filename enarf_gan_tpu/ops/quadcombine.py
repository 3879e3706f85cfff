"""Fused post-gather combine for the quad sampler (Pallas TPU kernel).

STATUS: experimental, opt-in via ENARF_FUSED_COMBINE=1 — the kernel
currently trips a 25 MB Mosaic scoped-vmem stack allocation on the remote
compiler regardless of block/chunk size (under investigation); the XLA
path below is the default and is numerically identical.

Consumes the two gather outputs of ``ops/quadtable.py`` — feature quad rows
``g`` and mask/weight rows ``mw`` — and produces per-point features and
candidate weights in ONE VMEM pass:

    cand_w[m]  = prod_p sigmoid( sum_q gm[p,m,q] * wq[p,m,q] )
    feature    = sum_m cand_w[m]*valid[m] * sum_p sum_q wq[p,m,q]*gf[p,m,q,:]

The XLA formulation materializes the (3, M, n, F) partial-feature tensor
and several mask intermediates through HBM; the kernel keeps everything in
VMEM tiles (measured win: a few ms per 196K-point chunk — PERF.md).

Differentiation: forward runs the kernel; the VJP recomputes through the
(numerically identical) XLA combine — exact gradients, no hand-written
backward kernel (pattern per the Pallas guide's custom-VJP section).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

NB = 128  # points per kernel block — small enough that the kernel's
          # peak live set (Mosaic allocates it as a static stack frame)
          # stays under the 16 MB scoped-vmem limit


def use_fused_combine() -> bool:
    if os.environ.get("ENARF_FUSED_COMBINE", "0") != "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def combine_xla(g, mw, valid, F: int, clamp_mask: bool = False):
    """Reference combine in plain XLA.

    Args:
        g: (P, n, 4F) bf16/f32 feature quad rows, P = 3*M (plane-major).
        mw: (P, n, 8) f32 — lanes [gm(4) | wq(4)].
        valid: (n, M) f32/bool.
    Returns:
        feature (n, F) f32, cand_w (n, M) f32.
    """
    from enarf_gan_tpu.ops.activation import straight_through_clamp
    P, n, _ = g.shape
    M = P // 3
    gm = mw[..., :4]
    wq = mw[..., 4:]
    logit = (gm * wq).sum(axis=-1).reshape(3, M, n)
    if clamp_mask:
        logit = straight_through_clamp(logit)
    cand_w = jax.nn.sigmoid(logit).prod(axis=0)                 # (M, n)
    gf = g.reshape(3, M, n, 4, F)
    featm = jnp.einsum("pmnqf,pmnq->mnf", gf.astype(jnp.float32),
                       wq.reshape(3, M, n, 4))                  # (M, n, F)
    wv = cand_w * jnp.swapaxes(valid, 0, 1).astype(jnp.float32)  # (M, n)
    feature = jnp.einsum("mnf,mn->nf", featm, wv)
    return feature, jnp.swapaxes(cand_w, 0, 1)                  # (n,F),(n,M)


def _combine_kernel(g_ref, mw_ref, valid_ref, feat_ref, cw_ref, *, F, M,
                    clamp_mask):
    acc = jnp.zeros((NB, F), jnp.float32)
    for m in range(M):
        cw = jnp.ones((NB, 1), jnp.float32)
        featm = jnp.zeros((NB, F), jnp.float32)
        for p in range(3):
            i = p * M + m
            gm_i = mw_ref[i, :, 0:4]
            wq_i = mw_ref[i, :, 4:8]
            logit = (gm_i * wq_i).sum(axis=1, keepdims=True)    # (NB, 1)
            if clamp_mask:
                logit = jnp.clip(logit, -4.0, 4.0)
            cw = cw * jax.nn.sigmoid(logit)
            g_i = g_ref[i]
            for q in range(4):
                featm = featm + (g_i[:, q * F:(q + 1) * F].astype(jnp.float32)
                                 * wq_i[:, q:q + 1])
        wv = cw * valid_ref[:, m:m + 1]
        acc = acc + featm * wv
        cw_ref[:, m:m + 1] = cw
    feat_ref[:] = acc


CHUNK = 16384  # points per pallas invocation — keeps the call's result
               # buffer ~2 MB (XLA stages custom-call results in scoped
               # VMEM, whose limit is 16 MB; one big call OOMs at 196K pts)


def _combine_pallas_one(g, mw, valid, F: int, M: int, clamp_mask: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    P, n, L = g.shape
    kern = functools.partial(_combine_kernel, F=F, M=M, clamp_mask=clamp_mask)
    return pl.pallas_call(
        kern,
        grid=(n // NB,),
        in_specs=[
            pl.BlockSpec((P, NB, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NB, 8), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((NB, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, F), jnp.float32),
                   jax.ShapeDtypeStruct((n, M), jnp.float32)),
    )(g, mw, valid)


def _combine_pallas(g, mw, valid, F: int, clamp_mask: bool):
    P, n, L = g.shape
    M = P // 3
    pad = (-n) % CHUNK
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        mw = jnp.pad(mw, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
    npad = n + pad
    validf = valid.astype(jnp.float32)
    n_chunks = npad // CHUNK
    if n_chunks == 1:
        feat, cw = _combine_pallas_one(g, mw, validf, F, M, clamp_mask)
        return feat[:n], cw[:n]

    def step(_, start):
        gb = jax.lax.dynamic_slice(g, (0, start, 0), (P, CHUNK, L))
        mwb = jax.lax.dynamic_slice(mw, (0, start, 0), (P, CHUNK, 8))
        vb = jax.lax.dynamic_slice(validf, (start, 0), (CHUNK, M))
        return None, _combine_pallas_one(gb, mwb, vb, F, M, clamp_mask)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK
    _, (feat, cw) = jax.lax.scan(step, None, starts)
    return (feat.reshape(npad, F)[:n], cw.reshape(npad, M)[:n])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_combine(g, mw, valid, F: int, clamp_mask: bool = False):
    """Kernel forward / XLA-recompute backward (see module docstring)."""
    if use_fused_combine() and not clamp_mask:
        return _combine_pallas(g, mw, valid, F, clamp_mask)
    return combine_xla(g, mw, valid, F, clamp_mask)


def _fc_fwd(g, mw, valid, F, clamp_mask):
    return fused_combine(g, mw, valid, F, clamp_mask), (g, mw, valid)


def _fc_bwd(F, clamp_mask, res, ct):
    g, mw, valid = res
    _, vjp = jax.vjp(lambda a, b: combine_xla(a, b, valid, F, clamp_mask),
                     g, mw)
    dg, dmw = vjp(ct)
    return dg, dmw, None


fused_combine.defvjp(_fc_fwd, _fc_bwd)
