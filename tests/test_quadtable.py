"""Quad-table sampler parity vs the per-plane grid-sample oracle path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enarf_gan_tpu.ops.quadtable import pack_quadtable, sample_candidates_quadtable
from enarf_gan_tpu.ops.rowtable import pack_rowtable, sample_candidates_rowtable
from enarf_gan_tpu.ops.triplane import (
    sample_part_prob_candidates, sample_weighted_feature_candidates)


@pytest.mark.parametrize("H,W,F,K,n,M", [(16, 16, 8, 5, 64, 3),
                                         (8, 12, 4, 23, 33, 4)])
def test_quadtable_matches_gridsample_oracle(H, W, F, K, n, M):
    rng = np.random.default_rng(0)
    B = 2
    planes = jnp.asarray(rng.normal(size=(B, (F + K) * 3, H, W))
                         .astype(np.float32))
    # positions spanning in-range, edges, and far out-of-range
    pos = jnp.asarray(rng.uniform(-1.4, 1.4, (B, n, M, 3)).astype(np.float32))
    pos = pos.at[:, :4].set(jnp.asarray(
        [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
         [-0.999, 0.999, 0.0], [2.0, 2.0, 2.0]], jnp.float32)[None, :, None, :])
    idx = jnp.asarray(rng.integers(0, K, (B, n, M)).astype(np.int32))
    valid = jnp.asarray(rng.random((B, n, M)) > 0.3)

    tables = pack_quadtable(planes, F, K, jnp.float32)
    feat, w = sample_candidates_quadtable(tables, pos, idx, valid, F, K, H, W)

    w_ref = sample_part_prob_candidates(planes[:, F * 3:], idx, pos)
    feat_ref = sample_weighted_feature_candidates(
        F, planes[:, :F * 3], pos, (w_ref * valid).astype(jnp.float32), valid)

    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_ref),
                               rtol=2e-4, atol=2e-4)


def test_quadtable_matches_rowtable():
    """Same inputs → same outputs as the (already oracle-tested) row table."""
    rng = np.random.default_rng(3)
    H, W, F, K, n, M = 12, 12, 8, 7, 50, 4
    B = 1
    planes = jnp.asarray(rng.normal(size=(B, (F + K) * 3, H, W))
                         .astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1.2, 1.2, (B, n, M, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, K, (B, n, M)).astype(np.int32))
    valid = jnp.asarray(rng.random((B, n, M)) > 0.2)

    qt = pack_quadtable(planes, F, K, jnp.float32)
    f1, w1 = sample_candidates_quadtable(qt, pos, idx, valid, F, K, H, W)
    rt = pack_rowtable(planes, F, K, jnp.float32)
    f2, w2 = sample_candidates_rowtable(rt, pos, idx, valid, F, K, H, W)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-4,
                               atol=1e-4)


def test_quadtable_gradients_match():
    """VJP of the fused path ≈ VJP of the oracle composition."""
    rng = np.random.default_rng(1)
    H = W = 8
    F, K, n, M = 4, 6, 17, 3
    B = 1
    planes = jnp.asarray(rng.normal(size=(B, (F + K) * 3, H, W))
                         .astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1.1, 1.1, (B, n, M, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, K, (B, n, M)).astype(np.int32))
    valid = jnp.ones((B, n, M), bool)

    def fused(planes, pos):
        tables = pack_quadtable(planes, F, K, jnp.float32)
        feat, w = sample_candidates_quadtable(tables, pos, idx, valid, F, K, H, W)
        return (feat ** 2).sum() + (w ** 2).sum()

    def oracle(planes, pos):
        w = sample_part_prob_candidates(planes[:, F * 3:], idx, pos)
        feat = sample_weighted_feature_candidates(
            F, planes[:, :F * 3], pos, (w * valid).astype(jnp.float32), valid)
        return (feat ** 2).sum() + (w ** 2).sum()

    g1 = jax.grad(fused, argnums=(0, 1))(planes, pos)
    g2 = jax.grad(oracle, argnums=(0, 1))(planes, pos)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
