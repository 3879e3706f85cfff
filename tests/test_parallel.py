"""Sharding tests over the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enarf_gan_tpu.parallel.mesh import (make_mesh, shard_batch, replicate,
                                         data_sharding, shard_rays)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout(rng):
    mesh = make_mesh()
    batch = {"img": rng.randn(8, 3, 4, 4).astype(np.float32),
             "scalar": np.float32(2.0)}
    sharded = shard_batch(mesh, batch)
    assert sharded["img"].sharding.is_fully_replicated is False
    # each device holds one slice of the batch axis
    shard_shapes = {s.data.shape for s in sharded["img"].addressable_shards}
    assert shard_shapes == {(1, 3, 4, 4)}
    assert sharded["scalar"].sharding.is_fully_replicated


def test_global_semantics_under_jit(rng):
    """A jitted global-batch reduction over sharded data matches numpy —
    GSPMD inserts the collective (the minibatch-std / metric all_reduce
    equivalent, reference custom_stylegan2/net.py:665-667)."""
    mesh = make_mesh()
    x = rng.randn(8, 16).astype(np.float32)
    xs = shard_batch(mesh, x)

    @jax.jit
    def global_std(x):
        return x.std(axis=0).mean()

    np.testing.assert_allclose(float(global_std(xs)),
                               float(x.std(axis=0).mean()), rtol=1e-5)


def test_sharded_gradient_allreduce(rng):
    """DP gradients of a replicated param over a sharded batch equal the
    single-device gradient of the global batch."""
    mesh = make_mesh()
    w = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    x = rng.randn(8, 16).astype(np.float32)

    def loss(w, x):
        return ((x @ w) ** 2).mean()

    g_local = jax.grad(loss)(w, jnp.asarray(x))
    xs = shard_batch(mesh, x)
    wr = replicate(mesh, w)
    g_sharded = jax.jit(jax.grad(loss))(wr, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local),
                               rtol=1e-4, atol=1e-5)


def test_ray_axis_sharding(rng):
    """Single-image rays sharded across devices: render math is per-ray, so
    outputs match the replicated run (SURVEY.md §5.7 ray sharding)."""
    from enarf_gan_tpu.nerf.rendering import decide_frustum_range
    mesh = make_mesh()
    pose = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    pose[:, :, 2, 3] = 3.0
    inv_K = np.linalg.inv(np.array([[100, 0, 64], [0, 100, 64], [0, 0, 1]],
                                   np.float32))
    coord = np.random.RandomState(0).uniform(
        0, 128, (1, 1, 3, 64)).astype(np.float32)
    coord[:, :, 2] = 1.0

    f = jax.jit(lambda c: decide_frustum_range(c, jnp.asarray(pose),
                                               jnp.asarray(inv_K), 0.3, 5.0))
    ref = f(jnp.asarray(coord))
    sharded_coord = shard_rays(mesh, coord)
    out = f(sharded_coord)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
