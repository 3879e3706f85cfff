"""Fused Pallas combine for the patch-window sampler (ops/tilewin.py).

Why: the XLA combine of sample_tilewin materializes multi-hundred-MB HBM
intermediates per chunk (the f32 (.., m, 49) bilinear-weight tensor, the
(.., 49, F) window view, the per-slot member features) — measured 16 ms of
a 22 ms sample on a 147K-group chunk while the underlying FLOPs are <0.1 ms.
This kernel streams the gathered window rows through VMEM once and writes
ONLY the final per-point feature and the candidate weights:

    per (patch, sample) unit, all 3 planes x Mp slots co-resident:
      w49[m, w] = wt(dt,fy) * ws(ds,fx)      (separable bilinear, built
                                               in-register per texel w)
      feat[slot, m, F]  += w49 * window[w, F]     (49 VPU fma passes)
      logit[p, slot, m] += w49 * maskwin[w]
      cand_w = prod_p sigmoid(logit)
      feature[m, F] = sum_slot cand_w * valid * feat

HBM traffic per chunk drops from ~3 GB to (gathered rows once) + ~30 MB
of outputs. Forward-only: callers wrap it in a custom_vjp whose backward
recomputes through the XLA path (ops/tilewin.py::sample_tilewin), so
training semantics are unchanged.

Reference equivalents: cuda_extension/TriplaneSampler_kernel.cu:37-92 (the
fused gather-interpolate-reduce the CUDA extension exists for),
libraries/triplane/sampling.py:54-127.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 7
TB = 128           # (patch, sample) units per block


def _combine_kernel(win_ref, mwin_ref, dt_ref, ds_ref, fy_ref, fx_ref,
                    valid_ref, feat_ref, candw_ref, *, F: int, Mp: int,
                    clamp_mask: bool):
    """One block: TB units x (3 planes x Mp slots) windows -> features.

    Block shapes (leading 1 = batch):
      win:   (1, 3, Mp, TB, WL)  bf16, WL = padded 49*F lanes
      mwin:  (1, 3, Mp, TB, 64)  bf16
      dt/ds/fy/fx: (1, 3, Mp, TB, 16) f32  (window-local texel + fraction)
      valid: (1, Mp, TB, 16) f32
      feat out:  (1, TB, 16, F) f32
      candw out: (1, Mp, TB, 16) f32
    """
    M = 16
    win = win_ref[0]                       # (3, Mp, TB, WL)
    mwin = mwin_ref[0].astype(jnp.float32)
    dt = dt_ref[0]
    ds = ds_ref[0]
    fy = fy_ref[0]
    fx = fx_ref[0]
    valid = valid_ref[0]                   # (Mp, TB, M)

    feat_acc = jnp.zeros((3, Mp, TB, M, F), jnp.float32)
    logit_acc = jnp.zeros((3, Mp, TB, M), jnp.float32)
    for ti in range(WIN):
        # wt(ti) per (3, Mp, TB, 16); validity zeroes the member's weights
        # (matches sample_tilewin's `w49 * vm`, so cand_w is bit-comparable)
        wt = (jnp.where(dt == ti, 1.0 - fy, 0.0)
              + jnp.where(dt + 1.0 == ti, fy, 0.0)) * valid[None]
        for si in range(WIN):
            w = ti * WIN + si
            ws = (jnp.where(ds == si, 1.0 - fx, 0.0)
                  + jnp.where(ds + 1.0 == si, fx, 0.0))
            w49 = wt * ws                              # (3, Mp, TB, 16)
            texel = win[..., w * F:(w + 1) * F].astype(jnp.float32)
            feat_acc = feat_acc + w49[..., None] * texel[..., None, :]
            logit_acc = logit_acc + w49 * mwin[..., w][..., None]
    if clamp_mask:
        logit_acc = jnp.clip(logit_acc, -2.0, 5.0)
    sig = jax.nn.sigmoid(logit_acc)                    # (3, Mp, TB, M)
    cand_w = sig[0] * sig[1] * sig[2]                  # (Mp, TB, M)
    # (Mosaic has no reduce_prod lowering; planes dim is static 3)
    candw_ref[0] = cand_w
    wv = cand_w * valid                                # (Mp, TB, M)
    feat_ref[0] = (feat_acc.sum(axis=0) * wv[..., None]).sum(axis=0)


def tilewin_combine(win_rows: jnp.ndarray, mask_rows: jnp.ndarray,
                    dt: jnp.ndarray, ds: jnp.ndarray, fy: jnp.ndarray,
                    fx: jnp.ndarray, valid: jnp.ndarray, F: int,
                    clamp_mask: bool = False,
                    interpret: bool = False):
    """Fused combine over gathered window rows.

    Args:
        win_rows: (B, 3, Mp, U, WL) bf16 gathered feature windows
            (WL >= 49*F lanes, flat layout).
        mask_rows: (B, 3, Mp, U, 64) bf16 gathered mask windows.
        dt, ds, fy, fx: (B, 3, Mp, U, 16) f32 member texel offsets within
            the window (dt/ds integral-valued) and bilinear fractions.
        valid: (B, Mp, U, 16) f32 slot-member validity.
    Returns:
        feature (B, U, 16, F) f32, cand_w (B, Mp, U, 16) f32.
    """
    B, three, Mp, U, WL = win_rows.shape
    assert three == 3 and WL >= WIN * WIN * F, (win_rows.shape, F)
    assert U % TB == 0, (U, TB)
    win_rows = win_rows[..., :WIN * WIN * F]
    grid = (B, U // TB)

    def im5(b, i):
        return (b, 0, 0, i, 0)

    def im4(b, i):
        return (b, 0, i, 0)

    spec5 = lambda w: pl.BlockSpec((1, 3, Mp, TB, w), im5,  # noqa: E731
                                   memory_space=pltpu.VMEM)
    kern = functools.partial(_combine_kernel, F=F, Mp=Mp,
                             clamp_mask=clamp_mask)
    feat, cand_w = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec5(WIN * WIN * F), spec5(64), spec5(16), spec5(16),
                  spec5(16), spec5(16),
                  pl.BlockSpec((1, Mp, TB, 16), im4,
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, TB, 16, F), im4,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Mp, TB, 16), im4,
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, U, 16, F), jnp.float32),
                   jax.ShapeDtypeStruct((B, Mp, U, 16), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(win_rows, mask_rows, dt, ds, fy, fx, valid)
    return feat, cand_w
