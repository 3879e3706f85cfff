import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from enarf_gan_tpu.nn.layers import (
    EqualLinear, EqualConv1d, EqualConv2d, ModulatedConv1d, StyledConv1d,
    StyledMLP, MLP, fused_leaky_relu, pixel_norm)
from enarf_gan_tpu.nn.stylegan2 import (
    MappingNetwork, SynthesisNetwork, StyleGAN2Generator, Discriminator)

KEY = jax.random.PRNGKey(0)


def test_equal_linear_matches_reference(rng):
    x = rng.randn(4, 16).astype(np.float32)
    layer = EqualLinear(8, bias_init=0.5, lr_mul=0.1)
    params = layer.init(KEY, jnp.array(x))
    w = np.array(params["params"]["weight"])
    out = np.array(layer.apply(params, jnp.array(x)))
    # reference: out = x @ (W*scale).T + bias*lr_mul (net.py:161-174)
    scale = 0.1 / math.sqrt(16)
    expect = x @ (w * scale).T + 0.5 * 0.1
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_equal_linear_fused_activation(rng):
    x = rng.randn(4, 16).astype(np.float32)
    layer = EqualLinear(8, activation=True)
    params = layer.init(KEY, jnp.array(x))
    out = np.array(layer.apply(params, jnp.array(x)))
    w = np.array(params["params"]["weight"]) / math.sqrt(16)
    pre = x @ w.T
    expect = TF.leaky_relu(torch.tensor(pre), 0.2).numpy() * math.sqrt(2)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_equal_conv1d_grouped(rng):
    x = rng.randn(2, 12, 9).astype(np.float32)
    layer = EqualConv1d(6, groups=3)
    params = layer.init(KEY, jnp.array(x))
    out = layer.apply(params, jnp.array(x))
    assert out.shape == (2, 6, 9)
    # grouped: output channel 0..1 depends only on input 0..3
    x2 = x.copy()
    x2[:, 4:] = 0
    out2 = layer.apply(params, jnp.array(x2))
    np.testing.assert_allclose(np.array(out)[:, :2], np.array(out2)[:, :2], rtol=1e-5)


def test_modulated_conv1d_matches_torch_reference(rng):
    """Check against a verbatim port of reference net.py:230-254."""
    B, Cin, Cout, n, sdim = 3, 8, 6, 11, 4
    x = rng.randn(B, Cin, n).astype(np.float32)
    style = rng.randn(B, sdim).astype(np.float32)
    layer = ModulatedConv1d(Cout, sdim)
    params = layer.init(KEY, jnp.array(x), jnp.array(style))
    ours = np.array(layer.apply(params, jnp.array(x), jnp.array(style)))

    w = np.array(params["params"]["weight"])[0]  # (Cout, Cin) [groups=1]
    mod_w = np.array(params["params"]["modulation"]["weight"])
    mod_b = np.array(params["params"]["modulation"]["bias"])
    # torch reference computation
    s = torch.tensor(style) @ torch.tensor(mod_w * (1 / math.sqrt(sdim))).T \
        + torch.tensor(mod_b)
    weight = (1 / math.sqrt(Cin)) * torch.tensor(w)[None] * s[:, None, :]  # (B,Cout,Cin)
    weight = TF.normalize(weight.view(B, Cout, -1), dim=-1).view(B * Cout, Cin, 1)
    inp = torch.tensor(x).view(1, B * Cin, n)
    ref = TF.conv1d(inp, weight, groups=B).view(B, Cout, n)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-4)


def test_styled_mlp_shapes(rng):
    x = jnp.array(rng.randn(2, 32, 50).astype(np.float32))
    z = jnp.array(rng.randn(2, 64).astype(np.float32))
    m = StyledMLP(hidden_dim=64, out_dim=4, style_dim=64)
    params = m.init(KEY, x, z)
    out = m.apply(params, x, z)
    assert out.shape == (2, 4, 50)


def test_mlp_skips(rng):
    x = jnp.array(rng.randn(2, 60, 13).astype(np.float32))
    m = MLP(hidden_dim=32, out_dim=32, num_layers=8, skips=(4,))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (2, 32, 13)


def test_mapping_network_w_avg():
    z = jax.random.normal(KEY, (8, 64))
    m = MappingNetwork(style_dim=64, num_layers=4)
    variables = m.init(KEY, z)
    w, mutated = m.apply(variables, z, update_w_avg=True, mutable=["stats"])
    assert w.shape == (8, 64)
    assert not np.allclose(np.array(mutated["stats"]["w_avg"]), 0)
    # truncation toward w_avg reduces variance
    variables = {"params": variables["params"], "stats": mutated["stats"]}
    w_trunc = m.apply(variables, z, truncation_psi=0.4)
    assert np.array(w_trunc).std() < np.array(w).std()


def test_mapping_conditioned():
    z = jax.random.normal(KEY, (4, 64))
    c = jax.random.normal(jax.random.PRNGKey(1), (4, 24))
    m = MappingNetwork(style_dim=64, num_layers=2, c_dim=24)
    variables = m.init(KEY, z, c)
    w1 = m.apply(variables, z, c)
    w2 = m.apply(variables, z, jax.random.normal(jax.random.PRNGKey(7), (4, 24)))
    assert not np.allclose(np.array(w1), np.array(w2))


def test_synthesis_shapes_and_wide():
    lat = jax.random.normal(KEY, (2, 6, 64))  # size 16 → n_latent 6
    net = SynthesisNetwork(size=16, out_channels=5, use_noise=False)
    params = net.init(KEY, lat)
    img = net.apply(params, lat)
    assert img.shape == (2, 5, 16, 16)

    wide = SynthesisNetwork(size=16, out_channels=3, wide=True, use_noise=False)
    paramsw = wide.init(KEY, lat)
    imgw = wide.apply(paramsw, lat)
    assert imgw.shape == (2, 3, 16, 32)


def test_generator_end_to_end_and_crop():
    gen = StyleGAN2Generator(size=16, style_dim=64, n_mlp=2, crop_background=True,
                             use_noise=True)
    z = jax.random.normal(KEY, (2, 64))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    variables = gen.init(KEY, [z])
    img = gen.apply(variables, [z], noise_rng=jax.random.PRNGKey(3))
    assert img.shape == (2, 3, 16, 16)  # center-cropped at eval
    img_train = gen.apply(variables, [z, z2], inject_index=3, train=True,
                          crop_rng=jax.random.PRNGKey(4),
                          noise_rng=jax.random.PRNGKey(5))
    assert img_train.shape == (2, 3, 16, 16)


def test_generator_truncation_changes_output():
    gen = StyleGAN2Generator(size=8, style_dim=32, n_mlp=2, use_noise=False)
    z = jax.random.normal(KEY, (2, 32))
    variables = gen.init(KEY, [z])
    # push w_avg away from 0 first
    _, mut = gen.apply(variables, [z], update_w_avg=True, mutable=["stats"])
    variables = {"params": variables["params"], "stats": mut["stats"]}
    img1 = gen.apply(variables, [z], truncation_psi=1.0)
    img04 = gen.apply(variables, [z], truncation_psi=0.4)
    assert not np.allclose(np.array(img1), np.array(img04))


def test_discriminator_shapes_and_grad():
    disc = Discriminator(size=16, minibatch_std=True)
    x = jax.random.normal(KEY, (4, 3, 16, 16))
    params = disc.init(KEY, x)
    out = disc.apply(params, x)
    assert out.shape == (4, 1)

    def loss(p, x):
        return disc.apply(p, x).sum()

    g = jax.grad(loss)(params, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.array(l)).all() for l in leaves)
    assert any(np.abs(np.array(l)).sum() > 0 for l in leaves)


def test_r1_gradient_penalty_through_discriminator():
    """Double backward through D (reference gan/loss.py:23-29)."""
    disc = Discriminator(size=8, minibatch_std=False)
    x = jax.random.normal(KEY, (2, 3, 8, 8))
    params = disc.init(KEY, x)

    def r1(params, x):
        grad_real = jax.grad(lambda xx: disc.apply(params, xx).sum())(x)
        return (grad_real.reshape(x.shape[0], -1) ** 2).sum(axis=1).mean()

    val, g = jax.value_and_grad(r1)(params, x)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.array(l)).all() for l in leaves)
