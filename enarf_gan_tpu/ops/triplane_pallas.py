"""Pallas TPU kernel: fused weighted tri-plane gather-sum.

TPU-native equivalent of the reference's hand-written CUDA TriplaneSampler
(reference: cuda_extension/TriplaneSampler_kernel.cu — per point, loop the 3
planes with coord pairs (x,y),(y,z),(z,x), bilinear sample, sum in-register).
Here the whole candidate-bone weighted sum fuses into one kernel:

    out[t, :] = Σ_m w[t, m] · Σ_p bilinear(plane_p, coords_p(pos[t, m]))

The three F-channel feature planes live in VMEM as one (3·H·W, F) row table
(bf16: 12.6 MB at 256², fits); each grid step processes a tile of points and
issues row gathers (``jnp.take`` on the sublane axis → Mosaic dynamic
gather). Out-of-range positions (validity masking upstream places them at 2)
contribute nothing via the in-bounds corner masks — grid_sample zero-padding
semantics.

Backward: ``custom_vjp`` whose bwd recomputes through the XLA reference
formulation (scatter-add handled by XLA) — the forward (inference hot path)
gets the fused kernel, training gradients stay exact.

Use ``fused_weighted_sample_candidates`` (candidate/top-M layout) or
``fused_weighted_sample`` (dense (B, K, …) layout, adapts then calls the
former).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from enarf_gan_tpu.ops.triplane import PLANE_COORDS

DEFAULT_TILE = 1024


def _planes_to_table(tri_plane_features: jnp.ndarray, feat_dim: int):
    """(B, F*3, H, W) → (B, 3*H*W, F) row table (plane-major, y, x)."""
    B, C3, H, W = tri_plane_features.shape
    t = tri_plane_features.reshape(B, 3, feat_dim, H, W)
    return t.transpose(0, 1, 3, 4, 2).reshape(B, 3 * H * W, feat_dim), H, W


def _kernel(pos_ref, w_ref, table_ref, out_ref, *, H, W, M, F):
    pos = pos_ref[0]        # (T, M, 3) — blocks carry a leading batch dim 1
    wgt = w_ref[0]          # (T, M)
    table = table_ref[0]    # (3HW, F)
    T = pos.shape[0]
    acc = jnp.zeros((T, F), jnp.float32)
    for m in range(M):
        wm = wgt[:, m]
        for p, (i, j) in enumerate(PLANE_COORDS):
            x = (pos[:, m, i] + 1) * (W / 2) - 0.5
            y = (pos[:, m, j] + 1) * (H / 2) - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            for cx, cy, cw in ((x0, y0, (1 - fx) * (1 - fy)),
                               (x0 + 1, y0, fx * (1 - fy)),
                               (x0, y0 + 1, (1 - fx) * fy),
                               (x0 + 1, y0 + 1, fx * fy)):
                inb = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
                idx = (p * H + jnp.clip(cy, 0, H - 1).astype(jnp.int32)) * W \
                    + jnp.clip(cx, 0, W - 1).astype(jnp.int32)
                rows = jnp.take(table, idx, axis=0)  # (T, F)
                acc = acc + rows.astype(jnp.float32) * \
                    (wm * cw * inb)[:, None].astype(jnp.float32)
    out_ref[0] = acc


def _fused_forward(table: jnp.ndarray, cand_pos: jnp.ndarray,
                   cand_w: jnp.ndarray, H: int, W: int,
                   tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """table (B, 3HW, F); cand_pos (B, n, M, 3); cand_w (B, n, M) → (B, n, F)."""
    B, n, M, _ = cand_pos.shape
    F = table.shape[-1]
    tile = min(tile, n)
    pad = (-n) % tile
    if pad:
        cand_pos = jnp.pad(cand_pos, ((0, 0), (0, pad), (0, 0), (0, 0)),
                           constant_values=2.0)
        cand_w = jnp.pad(cand_w, ((0, 0), (0, pad), (0, 0)))
    n_pad = n + pad
    n_tiles = n_pad // tile

    grid = (B, n_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, M=M, F=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, M, 3), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, M), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, table.shape[1], F), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, F), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, F), jnp.float32),
        interpret=_use_interpret(),
    )(cand_pos, cand_w, table)
    return out[:, :n]


def _use_interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _kernel_block_squeeze_fix(fn):
    return fn


def _xla_reference(feat_dim, tri_plane_features, cand_pos, cand_w, cand_valid):
    from enarf_gan_tpu.ops.triplane import sample_weighted_feature_candidates
    return sample_weighted_feature_candidates(feat_dim, tri_plane_features,
                                              cand_pos, cand_w, cand_valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_weighted_sample_candidates(feat_dim: int,
                                     tri_plane_features: jnp.ndarray,
                                     cand_pos: jnp.ndarray,
                                     cand_w: jnp.ndarray,
                                     cand_valid: jnp.ndarray) -> jnp.ndarray:
    """Pallas-fused version of sample_weighted_feature_candidates.

    Args mirror ops/triplane.py: planes (B, F*3, H, W), cand_pos (B, n, M, 3),
    cand_w / cand_valid (B, n, M). Returns (B, F, n) float32.
    """
    table, H, W = _planes_to_table(tri_plane_features, feat_dim)
    w = (cand_w * cand_valid).astype(cand_pos.dtype)
    out = _fused_forward(table, cand_pos, w, H, W)  # (B, n, F)
    return out.transpose(0, 2, 1)


def _fwd(feat_dim, tri_plane_features, cand_pos, cand_w, cand_valid):
    out = fused_weighted_sample_candidates(feat_dim, tri_plane_features,
                                           cand_pos, cand_w, cand_valid)
    return out, (tri_plane_features, cand_pos, cand_w, cand_valid)


def _bwd(feat_dim, res, g):
    tri_plane_features, cand_pos, cand_w, cand_valid = res
    _, vjp = jax.vjp(
        lambda planes, pos, w: _xla_reference(feat_dim, planes, pos, w,
                                              cand_valid),
        tri_plane_features, cand_pos, cand_w)
    d_planes, d_pos, d_w = vjp(g)
    return d_planes, d_pos, d_w, None


fused_weighted_sample_candidates.defvjp(_fwd, _bwd)


def fused_weighted_sample(tri_plane_features: jnp.ndarray,
                          position: jnp.ndarray, weight: jnp.ndarray,
                          position_validity: jnp.ndarray,
                          clamp_mask: bool = False) -> jnp.ndarray:
    """Dense (B, K, 3, n) layout adapter → fused candidate kernel with M=K."""
    del clamp_mask  # sum reduction has no clamp
    B, K, _, n = position.shape
    feat_dim = tri_plane_features.shape[1] // 3
    cand_pos = position.transpose(0, 3, 1, 2)      # (B, n, K, 3)
    cand_w = weight.transpose(0, 2, 1)             # (B, n, K)
    cand_valid = position_validity.transpose(0, 2, 1)
    return fused_weighted_sample_candidates(feat_dim, tri_plane_features,
                                            cand_pos, cand_w, cand_valid)
