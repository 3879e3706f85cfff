"""Bilinear 2-D grid sampling on TPU (pure XLA gathers).

Matches ``torch.nn.functional.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=False)``, the semantics the reference's
tri-plane path depends on (reference: libraries/triplane/sampling.py:40 and
cuda_extension/TriplaneSampler_kernel.cu:40-41). Exact parity here is what
makes checkpoint-level output parity possible.

This is the correctness-reference implementation; the fused Pallas kernel in
``ops/triplane_pallas.py`` accelerates the hot tri-plane path.
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather_hw(img_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """img_flat: (B, C, H*W); idx: (B, n) → (B, C, n)."""
    B, C, _ = img_flat.shape
    idx = jnp.broadcast_to(idx[:, None, :], (B, C, idx.shape[-1]))
    return jnp.take_along_axis(img_flat, idx, axis=2)


def grid_sample_2d(input: jnp.ndarray, grid_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of ``input`` (B, C, H, W) at ``grid_xy`` (B, n, 2).

    ``grid_xy[..., 0]`` is x (width axis), ``grid_xy[..., 1]`` is y (height),
    both normalized to [-1, 1]; align_corners=False, zeros padding.

    Returns (B, C, n).
    """
    B, C, H, W = input.shape
    n = grid_xy.shape[1]
    x = (grid_xy[:, :, 0] + 1) * (W / 2) - 0.5  # (B, n) pixel coords
    y = (grid_xy[:, :, 1] + 1) * (H / 2) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0  # weight of x1
    wy1 = y - y0
    wx0 = 1 - wx1
    wy0 = 1 - wy1

    def corner_idx_and_mask(cx, cy):
        inb = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
        ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        return iy * W + ix, inb

    img_flat = input.reshape(B, C, H * W)
    out = jnp.zeros((B, C, n), input.dtype)
    for cx, cy, w in ((x0, y0, wx0 * wy0), (x1, y0, wx1 * wy0),
                      (x0, y1, wx0 * wy1), (x1, y1, wx1 * wy1)):
        idx, inb = corner_idx_and_mask(cx, cy)
        val = _gather_hw(img_flat, idx)
        out = out + val * (w * inb)[:, None, :].astype(input.dtype)
    return out
