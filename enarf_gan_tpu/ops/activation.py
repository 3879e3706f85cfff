"""Custom-VJP activations.

``density_relu`` replicates the reference's MyReLU
(reference: libraries/NeRF/activation.py:5-16): ReLU forward, but the
backward pass leaks gradient with slope 0.1 in the negative region *only
when the gradient pushes the pre-activation up* (grad_output < 0, since loss
decreases by increasing the input). This prevents dead densities.

``straight_through_clamp`` replicates the detach-clamp trick used on
tri-plane mask logits (reference: libraries/triplane/sampling.py:47).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def density_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def _density_relu_fwd(x):
    return jnp.maximum(x, 0), x


def _density_relu_bwd(x, g):
    slope = 0.1
    grad = g * (x >= 0) + g * ((x < 0) & (g < 0)) * slope
    return (grad,)


density_relu.defvjp(_density_relu_fwd, _density_relu_bwd)


def straight_through_clamp(x: jnp.ndarray, lo: float = -2.0, hi: float = 5.0) -> jnp.ndarray:
    """Clamp in the forward pass, identity in the backward pass."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)
