import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from enarf_gan_tpu.training.losses import (
    adv_loss_dis, adv_loss_gen, push_to_background, nerf_bone_loss,
    nerf_patch_loss, photometric_loss, gather_pixels, triplane_l2_reg)


def test_adv_losses_match_reference(rng):
    real = rng.randn(8, 1).astype(np.float32)
    fake = rng.randn(8, 1).astype(np.float32)
    tr, tf_ = torch.tensor(real), torch.tensor(fake)
    # reference gan/loss.py:5-20
    np.testing.assert_allclose(
        float(adv_loss_dis(jnp.array(real), jnp.array(fake), "hinge")),
        float(TF.relu(1 - tr).mean() + TF.relu(1 + tf_).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(adv_loss_dis(jnp.array(real), jnp.array(fake), "ce")),
        float(TF.softplus(-tr).mean() + TF.softplus(tf_).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(adv_loss_gen(jnp.array(fake), "hinge")), float(-tf_.mean()),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(adv_loss_gen(jnp.array(fake), "ce")),
        float(TF.softplus(-tf_).mean()), rtol=1e-5)


def test_push_to_background_matches_reference(rng):
    fake_mask = rng.rand(2, 8, 8).astype(np.float32)
    ratio = 0.3
    ours = float(push_to_background(jnp.array(fake_mask), ratio))
    # reference models/loss.py:5-13
    fm = torch.tensor(fake_mask).reshape(-1)
    bottom = torch.topk(fm, k=int(fm.numel() * ratio), largest=False,
                        sorted=False)[0]
    np.testing.assert_allclose(ours, float((bottom ** 2).mean()), rtol=1e-5)


def test_nerf_bone_loss_with_downscale(rng):
    fake_mask = rng.rand(2, 8, 8).astype(np.float32)
    bone_mask = (rng.rand(2, 32, 32) > 0.5).astype(np.float32)
    ours = float(nerf_bone_loss(jnp.array(fake_mask), jnp.array(bone_mask)))
    # reference models/loss.py:16-24
    bm = TF.max_pool2d(torch.tensor(bone_mask)[:, None], 4, 4, 0)[:, 0]
    binary = bm > 0.5
    ref = ((1 - torch.tensor(fake_mask)) ** 2 * binary).sum() / binary.sum()
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_photometric_loss_gather(rng):
    B, H = 2, 8
    img = rng.randn(B, 3, H, H).astype(np.float32)
    mask = rng.rand(B, H, H).astype(np.float32)
    ray_idx = rng.randint(0, H * H, (B, 16))
    color = rng.randn(B, 3, 16).astype(np.float32)
    nmask = rng.rand(B, 16).astype(np.float32)
    lc, lm = photometric_loss(jnp.array(ray_idx), jnp.array(color),
                              jnp.array(nmask), jnp.array(img),
                              jnp.array(mask), "mse", 1.0, 1.0)
    # reference NeRF/loss.py:14-48
    ti = torch.tensor(img).reshape(B, 3, -1)
    sampled = torch.gather(ti, 2, torch.tensor(ray_idx)[:, None].repeat(1, 3, 1))
    ref_lc = TF.mse_loss(sampled, torch.tensor(color))
    tm = torch.gather(torch.tensor(mask).reshape(B, -1), 1, torch.tensor(ray_idx))
    ref_lm = TF.mse_loss(tm, torch.tensor(nmask))
    np.testing.assert_allclose(float(lc), float(ref_lc), rtol=1e-5)
    np.testing.assert_allclose(float(lm), float(ref_lm), rtol=1e-5)
    # trunc-mae variant
    lc2, _ = photometric_loss(jnp.array(ray_idx), jnp.array(color),
                              jnp.array(nmask), jnp.array(img),
                              jnp.array(mask), "mae", 1.0, 1.0)
    ref_mae = torch.clamp_min((sampled - torch.tensor(color)).abs(), 0.01).mean()
    np.testing.assert_allclose(float(lc2), float(ref_mae), rtol=1e-5)
