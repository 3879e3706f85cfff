import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enarf_gan_tpu.data.fixtures import (synthetic_rest_joints,
                                         synthetic_pose_sequence, camera_ring)
from enarf_gan_tpu.geometry.smpl import SMPL_PARENTS, canonical_pose_from_rest_joints
from enarf_gan_tpu.models.narf import NARFParams, TriPlaneNARF, MLPNARF
from enarf_gan_tpu.models.generator import (
    TriNARFGenerator, DSONARFGenerator, register_canonical_pose,
    dso_render_entire_img, gan_render_entire_img, pose_encoding)

KEY = jax.random.PRNGKey(0)
PARENTS = tuple(int(x) for x in SMPL_PARENTS)

TINY = dict(Nc=6, Nf=6, hidden_size=16, tri_plane_size=16, render_bs=128,
            coordinate_scale=3.0)


def scene(B=2, size=16):
    rest = synthetic_rest_joints()
    world = synthetic_pose_sequence(rest, B)
    extr = camera_ring(B)
    pose_cam = np.einsum("bij,bkjl->bkil", extr, world).astype(np.float32)
    pose_cam[:, :, 3, :] = [0, 0, 0, 1]
    focal = size * 1.2
    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1]],
                 np.float32)
    inv_K = np.linalg.inv(K)
    coord = world[:, :, :3, 3]
    bl = np.linalg.norm(coord[:, 1:] - coord[:, SMPL_PARENTS[1:]],
                        axis=2)[:, :, None].astype(np.float32)
    canonical = canonical_pose_from_rest_joints(rest)
    cam_rot = extr[:, :3, :3].astype(np.float32)
    return pose_cam, world, bl, inv_K, canonical, cam_rot


@pytest.mark.parametrize("variant", ["stylegan", "constant", "deformation",
                                     "selector", "trimask"])
def test_triplane_narf_variants(variant):
    p = NARFParams(view_dependent=False,
                   constant_triplane=(variant == "constant"),
                   deformation_field=(variant == "deformation"),
                   selector_mlp=(variant == "selector"),
                   constant_trimask=(variant == "trimask"),
                   **TINY)
    model = TriPlaneNARF(p, z_dim=8, z2_dim=8, num_bone=23, parent_id=PARENTS)
    z = jax.random.normal(KEY, (2, 8))
    bl = jnp.abs(jax.random.normal(KEY, (2, 23, 1))) + 0.1
    variables = model.init(KEY, z, bl, method="compute_tri_plane_feature")
    planes = model.apply(variables, z, bl, method="compute_tri_plane_feature")
    assert planes.shape == (2, (32 + 23) * 3, 16, 16)


def test_dso_generator_triplane_forward():
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=2, size=16)
    p = NARFParams(view_dependent=True, time_conditional=True,
                   pose_conditional=False, deformation_field=True, **TINY)
    gen = DSONARFGenerator(nerf_params=p, size=16, num_bone=24,
                           parent_id=PARENTS, use_triplane=True,
                           ray_batchsize=32)
    mask = jnp.ones((2, 16, 16))
    ft = jnp.array([0.1, 0.9])
    variables = gen.init(KEY, KEY, jnp.array(pose_cam), jnp.array(cam_rot),
                         mask, ft, jnp.array(bl), jnp.array(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        SMPL_PARENTS)
    color, nmask, ray_idx, aux = gen.apply(
        variables, KEY, jnp.array(pose_cam), jnp.array(cam_rot), mask, ft,
        jnp.array(bl), jnp.array(inv_K), background=-1.0)
    assert color.shape == (2, 3, 32)
    assert nmask.shape == (2, 32)
    assert ray_idx.shape == (2, 32)
    assert np.isfinite(np.array(color)).all()


def test_dso_generator_mlp_forward():
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=1, size=16)
    p = NARFParams(view_dependent=True, time_conditional=True,
                   pose_conditional=True, model_type="tnarf",
                   origin_location="center", **TINY)
    gen = DSONARFGenerator(nerf_params=p, size=16, num_bone=24,
                           parent_id=PARENTS, use_triplane=False,
                           ray_batchsize=16)
    mask = jnp.ones((1, 16, 16))
    ft = jnp.array([0.5])
    args = (KEY, jnp.array(pose_cam), jnp.array(cam_rot), mask, ft,
            jnp.array(bl), jnp.array(inv_K))
    variables = gen.init(KEY, *args)
    color, nmask, ray_idx, aux = gen.apply(variables, *args)
    assert color.shape == (1, 3, 16)
    assert np.isfinite(np.array(color)).all()


def test_gan_generator_forward_and_grad():
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=2, size=16)
    p = NARFParams(view_dependent=False, **TINY)
    gen = TriNARFGenerator(nerf_params=p, size=16, num_bone=24,
                           parent_id=PARENTS, z_dim=8, crop_background=True)
    z = jax.random.normal(KEY, (2, 8 * 4))
    args = (KEY, jnp.array(pose_cam), jnp.array(world), jnp.array(bl),
            z, jnp.array(inv_K))
    variables = gen.init(KEY, *args)
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        SMPL_PARENTS)
    (img, fg_mask, aux), mut = gen.apply(variables, *args, train=True,
                                         mutable=["stats"])
    assert img.shape == (2, 3, 16, 16)
    assert fg_mask.shape == (2, 16, 16)
    assert aux["tri_plane_feature"].shape[1] == (32 + 23) * 3
    assert np.isfinite(np.array(img)).all()

    # gradient flows to both nerf and background params
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        out, m, _ = gen.apply({"params": params, **rest}, *args)
        return (out ** 2).mean() + (m ** 2).mean()

    g = jax.grad(loss_fn)(params)
    gsum = jax.tree_util.tree_map(lambda x: float(np.abs(np.array(x)).sum()), g)
    flat = jax.tree_util.tree_leaves_with_path(gsum)
    nerf_nonzero = any(v > 0 for path, v in flat if "nerf" in str(path))
    bg_nonzero = any(v > 0 for path, v in flat if "background" in str(path))
    assert nerf_nonzero and bg_nonzero


def test_gan_generator_pretrained_background():
    """pretrained_background selects the frozen-church background
    (reference models/generator.py:33-38) and converted rosinality weights
    load into it losslessly."""
    from enarf_gan_tpu.training.checkpoint import (
        export_reference_state_dict, import_reference_state_dict,
        jax_tree_to_dict, load_pretrained_background)
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=2, size=16)
    p = NARFParams(view_dependent=False, **TINY)
    gen = TriNARFGenerator(nerf_params=p, size=16, num_bone=24,
                           parent_id=PARENTS, z_dim=8,
                           pretrained_background=True, pretrained_bg_size=32,
                           channel_max=16)
    z = jax.random.normal(KEY, (2, 8 * 4))
    args = (KEY, jnp.array(pose_cam), jnp.array(world), jnp.array(bl),
            z, jnp.array(inv_K))
    variables = gen.init(KEY, *args)
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        SMPL_PARENTS)
    assert "gen" in variables["params"]["background_generator"]
    img, fg_mask, aux = gen.apply(variables, *args)
    assert img.shape == (2, 3, 16, 16)
    assert np.isfinite(np.array(img)).all()

    # interop: exports under background_generator.gen.<rosinality name>,
    # and a raw g_ema-style dict loads back losslessly
    sd = export_reference_state_dict(variables)
    assert "background_generator.gen.style.1.weight" in sd, sorted(sd)[:40]
    assert "background_generator.gen.input.input" in sd
    assert "background_generator.gen.convs.0.conv.weight" in sd
    g_ema = {k[len("background_generator.gen."):]: v for k, v in sd.items()
             if k.startswith("background_generator.gen.")}
    zero_tpl = jax.tree_util.tree_map(lambda x: np.zeros_like(x),
                                      jax_tree_to_dict(variables))
    # restore the non-background leaves first so only bg is under test
    zero_tpl, _ = import_reference_state_dict(
        {k: v for k, v in sd.items()
         if not k.startswith("background_generator.")}, zero_tpl)
    new_vars, report = load_pretrained_background(zero_tpl, g_ema)
    a = jax.tree_util.tree_leaves(variables["params"]["background_generator"])
    b = jax.tree_util.tree_leaves(new_vars["params"]["background_generator"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dso_render_entire_img():
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=1, size=16)
    p = NARFParams(view_dependent=False, time_conditional=True,
                   constant_triplane=True, **TINY)
    gen = DSONARFGenerator(nerf_params=p, size=16, num_bone=24,
                           parent_id=PARENTS, use_triplane=True,
                           ray_batchsize=16)
    mask = jnp.ones((1, 16, 16))
    ft = jnp.array([0.2])
    variables = gen.init(KEY, KEY, jnp.array(pose_cam), jnp.array(cam_rot),
                         mask, ft, jnp.array(bl), jnp.array(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        SMPL_PARENTS)
    color, m, disp = dso_render_entire_img(
        gen, variables, KEY, jnp.array(pose_cam), jnp.array(inv_K), ft,
        jnp.array(bl), camera_pose=None, render_size=16, ray_batchsize=64)
    assert color.shape == (3, 16, 16)
    assert m.shape == (16, 16)
    assert np.isfinite(np.array(color)).all()


def test_gan_render_entire_img():
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=1, size=16)
    p = NARFParams(view_dependent=False, **TINY)
    gen = TriNARFGenerator(nerf_params=p, size=16, num_bone=24,
                           parent_id=PARENTS, z_dim=8)
    z = jax.random.normal(KEY, (1, 8 * 4))
    args = (KEY, jnp.array(pose_cam), jnp.array(world), jnp.array(bl), z,
            jnp.array(inv_K))
    variables = gen.init(KEY, *args)
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        SMPL_PARENTS)
    color, m, disp = gan_render_entire_img(gen, variables, KEY,
                                           jnp.array(pose_cam), jnp.array(bl),
                                           z, jnp.array(inv_K),
                                           truncation_psi=0.4)
    assert color.shape == (3, 16, 16)


def test_gan_generator_center_head_variant():
    """origin_location center+head: 24 bone frames (no root drop) + the
    appended head frame drive the full generator forward (reference
    models/generator.py:27-31 — its num_bone_param plumbing is vestigial:
    NARFBase.__init__ accepts but never stores it, libraries/NARF/base.py:
    11-18; the effective count comes from origin_location alone)."""
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=1, size=16)
    p = NARFParams(view_dependent=False, origin_location="center+head",
                   **TINY)
    gen = TriNARFGenerator(nerf_params=p, size=16, num_bone=24,
                           parent_id=PARENTS, z_dim=8)
    assert gen.model_num_bone == 24
    z = jax.random.normal(KEY, (1, 8 * 4))
    args = (KEY, jnp.array(pose_cam), jnp.array(world), jnp.array(bl), z,
            jnp.array(inv_K))
    variables = gen.init(KEY, *args)
    variables = register_canonical_pose(variables, canonical, "center+head",
                                        SMPL_PARENTS)
    img, m, aux = gen.apply(variables, *args)
    assert img.shape == (1, 3, 16, 16)
    assert np.isfinite(np.array(img)).all()


def test_pose_encoding_root_relative():
    pose_cam, *_ = scene(B=2)
    enc = np.array(pose_encoding(jnp.array(pose_cam)))
    assert enc.shape == (2, 23 * 9)
    # root-relative: applying a global rotation leaves the encoding unchanged
    from enarf_gan_tpu.geometry.pose import rotation_matrix
    R = np.array(rotation_matrix(jnp.array([0.8], jnp.float32)))[0]
    rotated = np.einsum("ij,bkjl->bkil", R, pose_cam)
    enc2 = np.array(pose_encoding(jnp.array(rotated.astype(np.float32))))
    np.testing.assert_allclose(enc, enc2, atol=1e-4)


def test_register_canonical_pose_values():
    pose_cam, world, bl, inv_K, canonical, cam_rot = scene(B=1, size=16)
    p = NARFParams(view_dependent=False, constant_triplane=True, **TINY)
    model = TriPlaneNARF(p, z_dim=8, z2_dim=8, num_bone=23, parent_id=PARENTS)
    z = jax.random.normal(KEY, (1, 8))
    blj = jnp.abs(jax.random.normal(KEY, (1, 23, 1))) + 0.1
    variables = model.init(KEY, z, blj, method="compute_tri_plane_feature")
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        SMPL_PARENTS)
    cp = np.array(variables["buffers"]["canonical_pose"])
    cl = np.array(variables["buffers"]["canonical_bone_length"])
    assert cp.shape == (23, 4, 4)
    # bone lengths = distances between canonical joints
    coord = canonical[:, :3, 3]
    expect = np.linalg.norm(coord[1:] - coord[SMPL_PARENTS[1:]], axis=1)
    np.testing.assert_allclose(cl, expect, rtol=1e-5)
