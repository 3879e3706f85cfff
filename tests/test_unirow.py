"""Unirow fused sampler parity vs the quad-table path + VJP correctness.

The unirow path (ops/unirow.py) packs feature and all-bone mask quads into
one 256-lane bf16 row and combines with a hand-written custom VJP; these
tests pin it to the (already oracle-tested) quadtable path and to autodiff
of the plain-XLA combine.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enarf_gan_tpu.ops.quadtable import (pack_quadtable,
                                         sample_candidates_quadtable)
from enarf_gan_tpu.ops.unirow import (_combine_xla, _unirow_combine,
                                      pack_unirow, sample_candidates_unirow)


def _inputs(H, W, F, K, n, M, B=2, seed=0):
    rng = np.random.default_rng(seed)
    planes = jnp.asarray(rng.normal(size=(B, (F + K) * 3, H, W))
                         .astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1.4, 1.4, (B, n, M, 3)).astype(np.float32))
    pos = pos.at[:, :4].set(jnp.asarray(
        [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
         [-0.999, 0.999, 0.0], [2.0, 2.0, 2.0]],
        jnp.float32)[None, :, None, :])
    idx = jnp.asarray(rng.integers(0, K, (B, n, M)).astype(np.int32))
    valid = jnp.asarray(rng.random((B, n, M)) > 0.3)
    return planes, pos, idx, valid


@pytest.mark.parametrize("H,W,F,K,n,M,clamp", [(16, 16, 8, 5, 64, 3, False),
                                               (8, 12, 4, 23, 33, 4, True)])
def test_unirow_matches_quadtable_bf16(H, W, F, K, n, M, clamp):
    planes, pos, idx, valid = _inputs(H, W, F, K, n, M)
    ut = pack_unirow(planes, F, K)
    f1, w1 = sample_candidates_unirow(ut, pos, idx, valid, F, K, H, W,
                                      clamp_mask=clamp)
    qt = pack_quadtable(planes, F, K, jnp.bfloat16)
    f2, w2 = sample_candidates_quadtable(qt, pos, idx, valid, F, K, H, W,
                                         clamp_mask=clamp)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2, np.float32),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("clamp", [False, True])
def test_unirow_combine_vjp_matches_autodiff(clamp):
    """Hand VJP (_combine_bwd) == autodiff of the plain XLA combine."""
    rng = np.random.default_rng(1)
    B, M, n, F = 2, 3, 40, 4
    RW = 4 * F + 128
    g = jnp.asarray(rng.normal(size=(B, 3, M, n, RW)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    wq4 = jnp.asarray(rng.uniform(0, 1, (B, 4, 3, M, n)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 24, (B, M, n)).astype(np.int32))
    valid = jnp.asarray((rng.random((B, M, n)) > 0.3).astype(np.float32))
    cf = jnp.asarray(rng.normal(size=(B, F, n)).astype(np.float32))
    cw = jnp.asarray(rng.normal(size=(B, M, n)).astype(np.float32))

    def loss_custom(g, wq4, valid):
        f, w = _unirow_combine(g, wq4, idx, valid, F, clamp)
        return (f * cf).sum() + (w * cw).sum()

    def loss_plain(g, wq4, valid):
        f, w = _combine_xla(g, wq4, idx, valid, F, clamp)
        return (f * cf).sum() + (w * cw).sum()

    v1, grads1 = jax.value_and_grad(loss_custom, argnums=(0, 1, 2))(
        g, wq4, valid)
    v2, grads2 = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(
        g, wq4, valid)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b, name in zip(grads1, grads2, ("dg", "dwq4", "dvalid")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-2, err_msg=name)


def test_unirow_end_to_end_gradients_match_quadtable():
    """d(loss)/d(planes, pos) through unirow ≈ through quadtable (bf16)."""
    H = W = 8
    F, K, n, M = 4, 6, 17, 3
    planes, pos, idx, valid = _inputs(H, W, F, K, n, M, B=1, seed=2)
    valid = jnp.ones_like(valid)

    def via_unirow(planes, pos):
        t = pack_unirow(planes, F, K)
        f, w = sample_candidates_unirow(t, pos, idx, valid, F, K, H, W)
        return (f ** 2).sum() + (w ** 2).sum()

    def via_quad(planes, pos):
        t = pack_quadtable(planes, F, K, jnp.bfloat16)
        f, w = sample_candidates_quadtable(t, pos, idx, valid, F, K, H, W)
        return (f.astype(jnp.float32) ** 2).sum() + \
            (w.astype(jnp.float32) ** 2).sum()

    g1 = jax.grad(via_unirow, argnums=(0, 1))(planes, pos)
    g2 = jax.grad(via_quad, argnums=(0, 1))(planes, pos)
    for a, b, name in zip(g1, g2, ("dplanes", "dpos")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=8e-2, atol=8e-2, err_msg=name)
