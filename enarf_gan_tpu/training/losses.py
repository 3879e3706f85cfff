"""Training losses (pure jnp).

GAN losses match reference libraries/gan/loss.py:5-29; bone-guided mask
losses match models/loss.py:5-30; the photometric loss matches
libraries/NeRF/loss.py:5-48.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ----------------------------- adversarial ----------------------------- #

def adv_loss_dis(real: jnp.ndarray, fake: jnp.ndarray, adv_loss_type: str,
                 tmp: float = 1.0) -> jnp.ndarray:
    if adv_loss_type == "hinge":
        return jax.nn.relu(1 - real).mean() + jax.nn.relu(1 + fake).mean()
    if adv_loss_type == "ce":
        return (jax.nn.softplus(-real * tmp).mean()
                + jax.nn.softplus(fake * tmp).mean())
    raise ValueError(f"{adv_loss_type} is not supported")


def adv_loss_gen(fake: jnp.ndarray, adv_loss_type: str, tmp: float = 1.0) -> jnp.ndarray:
    if adv_loss_type == "hinge":
        return -fake.mean()
    if adv_loss_type == "ce":
        return jax.nn.softplus(-fake * tmp).mean()
    raise ValueError(f"{adv_loss_type} is not supported")


def r1_penalty(dis_apply, dis_params, real_img: jnp.ndarray) -> jnp.ndarray:
    """R1 gradient penalty: ||∇_x D(x)||² (reference gan/loss.py:23-29).

    ``dis_apply(params, x) -> (B, 1)``; differentiable in ``dis_params``
    (double backward, as the reference's create_graph=True)."""
    grad_real = jax.grad(lambda x: dis_apply(dis_params, x).sum())(real_img)
    return (grad_real.reshape(real_img.shape[0], -1) ** 2).sum(axis=1).mean()


# --------------------------- bone-guided mask --------------------------- #

def push_to_background(fake_mask: jnp.ndarray, background_ratio: float = 0.3
                       ) -> jnp.ndarray:
    """Bottom-k% of the fake mask pushed to 0 (reference models/loss.py:5-13)."""
    if background_ratio <= 0:
        return jnp.float32(0.0)
    flat = fake_mask.reshape(-1)
    k = int(flat.shape[0] * background_ratio)
    bottom = -lax.top_k(-flat, k)[0]
    return (bottom ** 2).mean()


def _maxpool_downscale(bone_mask: jnp.ndarray, rate: int) -> jnp.ndarray:
    return lax.reduce_window(bone_mask, -jnp.inf, lax.max,
                             (1, rate, rate), (1, rate, rate),
                             ((0, 0), (0, 0), (0, 0)))


def nerf_bone_loss(fake_mask: jnp.ndarray, bone_mask: jnp.ndarray) -> jnp.ndarray:
    """Rendered FG mask must cover the bone mask (reference models/loss.py:16-24)."""
    assert fake_mask.ndim == bone_mask.ndim
    if fake_mask.shape[-1] != bone_mask.shape[-1]:
        rate = bone_mask.shape[-1] // fake_mask.shape[-1]
        bone_mask = _maxpool_downscale(bone_mask, rate)
    binary = bone_mask > 0.5
    return ((1 - fake_mask) ** 2 * binary).sum() / binary.sum()


def nerf_patch_loss(fake_mask: jnp.ndarray, bone_mask: jnp.ndarray,
                    background_ratio: float = 0.3, coef: float = 10.0) -> jnp.ndarray:
    return (push_to_background(fake_mask, background_ratio)
            + nerf_bone_loss(fake_mask, bone_mask)) * coef


# ----------------------------- photometric ----------------------------- #

def gather_pixels(img: jnp.ndarray, ray_idx: jnp.ndarray) -> jnp.ndarray:
    """img (B, C, H, W) + flat pixel indices (B, n) → (B, C, n)."""
    B, C, H, W = img.shape
    flat = img.reshape(B, C, H * W)
    idx = jnp.broadcast_to(ray_idx[:, None, :], (B, C, ray_idx.shape[-1]))
    return jnp.take_along_axis(flat, idx, axis=2)


def photometric_loss(ray_idx: jnp.ndarray, nerf_color: jnp.ndarray,
                     nerf_mask: jnp.ndarray, img: jnp.ndarray,
                     mask: Optional[jnp.ndarray],
                     loss_type: str = "mse", color_coef: float = 1.0,
                     mask_coef: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather GT pixels at sampled rays, compare (reference NeRF/loss.py:14-48)."""
    sampled_color = gather_pixels(img, ray_idx)
    if loss_type == "mse":
        loss_color = ((sampled_color - nerf_color) ** 2).mean() * color_coef
    elif loss_type == "mae":
        loss_color = jnp.maximum(jnp.abs(sampled_color - nerf_color),
                                 0.01).mean() * color_coef
    else:
        raise ValueError(loss_type)
    if mask is not None:
        B = mask.shape[0]
        sampled_mask = jnp.take_along_axis(mask.reshape(B, -1), ray_idx, axis=1)
        loss_mask = ((sampled_mask - nerf_mask) ** 2).mean() * mask_coef
    else:
        loss_mask = jnp.float32(0.0)
    return loss_color, loss_mask


def triplane_l2_reg(tri_plane_feature: jnp.ndarray) -> jnp.ndarray:
    """(reference train_ENARF_GAN.py:93-95)."""
    return (tri_plane_feature ** 2).mean()
