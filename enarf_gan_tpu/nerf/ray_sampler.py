"""Ray samplers (pure jnp, explicit PRNG).

* ``whole_image_grid_ray_sampler`` — all pixel centers (GAN path), matches
  reference libraries/NeRF/ray_sampler.py:42-67.
* ``mask_based_sampler`` — rays biased to a dilated foreground mask via
  maxpool(129) + uniform noise + top-k (DSO path), matches
  reference ray_sampler.py:7-39. top-k on noisy scores reproduces the
  reference's sampling distribution exactly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def image_grid_coords(render_size: int, patch_size: int, batchsize: int,
                      dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Homogeneous pixel-center coordinates for a full image grid.

    Returns (grid (B, P, P, 2) in [-1, 1], homo_img (B, 1, 3, P*P)).
    """
    ar = jnp.arange(patch_size, dtype=dtype)
    y, x = jnp.meshgrid(ar, ar, indexing="ij")
    rays = jnp.stack([x, y], axis=2)[None]  # (1, P, P, 2)
    rays = render_size * (rays + 0.5) / patch_size
    rays = jnp.broadcast_to(rays, (batchsize, patch_size, patch_size, 2))
    grid = rays / (render_size / 2) - 1
    flat = rays.reshape(batchsize, -1, 2).transpose(0, 2, 1)  # (B, 2, P*P)
    ones = jnp.ones((batchsize, 1, patch_size * patch_size), dtype)
    homo = jnp.concatenate([flat, ones], axis=1).reshape(batchsize, 1, 3, -1)
    return grid, homo


def whole_image_grid_ray_sampler(render_size: int, patch_size: int, batchsize: int
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return image_grid_coords(render_size, patch_size, batchsize)


def _maxpool2d_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W) max pool, stride 1, SAME-style padding of k//2."""
    pad = k // 2
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k), (1, 1, 1),
                             ((0, 0), (pad, pad), (pad, pad)))


def patch_based_sampler(rng: jax.Array, mask: jnp.ndarray,
                        ray_batchsize: int, P: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``ray_batchsize // P²`` whole P×P pixel patches biased to the
    dilated foreground mask — the patch-major analog of
    ``mask_based_sampler`` that feeds the tilewin fast path
    (ops/tilewin.py needs member rays grouped by pixel patch).

    Same dilation + noisy-top-k selection as the reference pixel sampler
    (reference ray_sampler.py:7-39), applied at patch granularity: the
    patch score is the max dilated-mask value over its member pixels, so
    any patch touching the dilated foreground competes uniformly.

    Returns (ray_idx (B, n) flat pixel indices in patch-major order,
    homo_img (B, 1, 3, n)) — same contract as ``mask_based_sampler``.
    """
    B, h, w = mask.shape
    assert h % P == 0 and w % P == 0, (h, w, P)
    # whole patches only: budgets round DOWN to a patch multiple (min one
    # patch) and are capped at the image's patch count (small images / init
    # traces); the returned ray count is n_patch * P² — callers consume
    # whatever n comes back (ray_idx-driven losses are count-agnostic)
    n_patch = max(ray_batchsize // (P * P), 1)
    n_patch = min(n_patch, (h // P) * (w // P))
    ray_batchsize = n_patch * P * P
    pad_size = 64  # reference ray_sampler.py:24 (kernel 129)
    dilated = _maxpool2d_same(mask.astype(jnp.float32), pad_size * 2 + 1)
    ps = dilated.reshape(B, h // P, P, w // P, P).max(axis=(2, 4)) \
        .reshape(B, -1)
    ps = ps + jax.random.uniform(rng, ps.shape, ps.dtype)
    _, pidx = lax.top_k(ps, n_patch)                     # (B, np)
    py, px = pidx // (w // P), pidx % (w // P)
    dy = jnp.arange(P).reshape(1, 1, P, 1)
    dx = jnp.arange(P).reshape(1, 1, 1, P)
    yy = py[:, :, None, None] * P + dy                   # (B, np, P, 1)
    xx = px[:, :, None, None] * P + dx                   # (B, np, 1, P)
    ray_idx = (yy * w + xx).reshape(B, -1)               # (B, np*P*P)
    x = (ray_idx % w).astype(jnp.float32)
    y = (ray_idx // w).astype(jnp.float32)
    rays = jnp.stack([x, y], axis=1) + 0.5               # (B, 2, n)
    ones = jnp.ones((B, 1, ray_batchsize), rays.dtype)
    homo = jnp.concatenate([rays, ones], axis=1).reshape(B, 1, 3, -1)
    return ray_idx, homo


def mask_based_sampler(rng: jax.Array, mask: jnp.ndarray, ray_batchsize: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``ray_batchsize`` pixels biased to the dilated foreground mask.

    Args:
        rng: PRNG key.
        mask: (B, H, W) in [0, 1].
        ray_batchsize: rays per image.
    Returns:
        (ray_idx (B, n) flat pixel indices, homo_img (B, 1, 3, n)).
    """
    B, h, w = mask.shape
    ray_batchsize = min(ray_batchsize, h * w)  # small images take every ray
    pad_size = 64  # reference ray_sampler.py:24 (kernel 129)
    dilated = _maxpool2d_same(mask.astype(jnp.float32), pad_size * 2 + 1)
    scores = dilated.reshape(B, h * w)
    scores = scores + jax.random.uniform(rng, scores.shape, scores.dtype)
    _, ray_idx = lax.top_k(scores, ray_batchsize)  # (B, n)
    x = (ray_idx % w).astype(jnp.float32)
    y = (ray_idx // w).astype(jnp.float32)
    rays = jnp.stack([x, y], axis=1) + 0.5  # (B, 2, n)
    ones = jnp.ones((B, 1, ray_batchsize), rays.dtype)
    homo = jnp.concatenate([rays, ones], axis=1).reshape(B, 1, 3, -1)
    return ray_idx, homo
