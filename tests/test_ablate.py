"""ENARF_ABLATE measurement hooks: shape-level regression coverage.

The ablation env var (models/narf.py::_ablate_stage) swaps sampler/head
outputs for cheap stand-ins so benches can DCE a stage. It must (a) warn
loudly when active, (b) keep every output shape identical to the real
path — including the with_stats=True tiled path the round-2 advisor
flagged (IndexError on out[2]).
"""
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enarf_gan_tpu.models import narf as narf_mod
from tests.test_tiled_render import build


@pytest.fixture
def ablate(monkeypatch):
    def set_stage(stage):
        monkeypatch.setenv("ENARF_ABLATE", stage)
        monkeypatch.setattr(narf_mod._ablate_stage, "_warned", False)
    return set_stage


def _prep(gen, variables, scene):
    pose_cam, bl, inv_K, ft = scene
    pose_cam, bl = jnp.asarray(pose_cam), jnp.asarray(bl)
    z = gen.apply(variables, ft, pose_cam, method="get_latents")
    pose_t, bl_t = gen.apply(variables, pose_cam, bl, method="transform_pose")
    planes = gen.apply(variables, z, bl_t,
                       method="compute_tri_plane_feature")
    rng = np.random.default_rng(0)
    return z, pose_t, bl_t, planes, rng


def _apply_tiled(gen, variables, scene, with_stats, n_patch=4, m=16, S=8):
    z, pose_t, bl_t, planes, rng = _prep(gen, variables, scene)
    tables = gen.apply(variables, planes, method="pack_planes_tiled")
    n = n_patch * m * S
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 3, n)).astype(np.float32))
    return gen.apply(variables, pos, pose_t, bl_t, tables, z, n_patch, m, S,
                     None, with_stats, method="nerf_density_color_tiled")


@pytest.mark.parametrize("with_stats", [False, True])
def test_ablate_sampler_tiled_shapes(ablate, with_stats):
    """ENARF_ABLATE=sampler + with_stats (the advisor's IndexError repro)
    must keep density/color/aux shapes identical to the real path."""
    gen, variables, scene = build(tile_patch=4)
    out0 = _apply_tiled(gen, variables, scene, with_stats)
    ablate("sampler")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out1 = _apply_tiled(gen, variables, scene, with_stats)
    assert any("ENARF_ABLATE" in str(x.message) for x in w)
    assert len(out1) == len(out0)
    d0, c0 = out0[0], out0[1]
    d1, c1 = out1[0], out1[1]
    assert d1.shape == d0.shape and c1.shape == c0.shape
    if with_stats:
        assert "tilewin_stats" in out1[2]
        assert "clamped" in out1[2]["tilewin_stats"]


@pytest.mark.parametrize("stage", ["sampler", "heads"])
def test_ablate_exact_path_shapes(ablate, stage):
    gen, variables, scene = build(tile_patch=0)
    z, pose_t, bl_t, planes, rng = _prep(gen, variables, scene)
    packed = gen.apply(variables, planes, method="pack_planes")
    n = 64 * 8
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 3, n)).astype(np.float32))

    def run():
        return gen.apply(variables, pos, pose_t, bl_t, packed, z, None,
                         method="nerf_density_color")

    d0, c0 = run()
    ablate(stage)
    d1, c1 = run()
    assert d1.shape == d0.shape and c1.shape == c0.shape
    assert np.all(np.isfinite(np.asarray(d1)))
