"""Tiled (patch-window) renderer vs the exact per-member renderer.

The tiled path changes the sampling PATTERN (patch-pooled coarse bins +
patch-common fine depths) but not the radiance field, so full-image
renders must agree closely — metric-level parity, not bitwise
(nerf/tiled.py docstring)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enarf_gan_tpu.models.narf import NARFParams
from enarf_gan_tpu.models.generator import (DSONARFGenerator,
                                            register_canonical_pose,
                                            dso_render_entire_img,
                                            dso_render_entire_img_tiled)
from enarf_gan_tpu.geometry.smpl import SMPL_PARENTS


SIZE, TS = 32, 32


def build(tile_patch, coarse_corners=False):
    import __graft_entry__ as ge
    params = NARFParams(Nc=8, Nf=8, hidden_size=16, tri_plane_size=TS,
                        render_bs=SIZE * SIZE, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=False, constant_triplane=True,
                        time_conditional=True, pose_conditional=False,
                        plane_sample_dtype="bfloat16", tile_patch=tile_patch,
                        tile_coarse_corners=coarse_corners)
    gen = DSONARFGenerator(nerf_params=params, size=SIZE, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=64)
    pose_cam, world, bl, inv_K, canonical, K = ge._tiny_scene(1, SIZE)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]),
                         jnp.ones((1, SIZE, SIZE)), ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))
    return gen, variables, (pose_cam, bl, inv_K, ft)


def build_gan(tile_patch, size=32):
    import __graft_entry__ as ge
    from enarf_gan_tpu.models.generator import TriNARFGenerator
    # Nc/Nf and plane size control the tiled estimator's pooled-bin
    # discretization gap (production is Nc48/Nf64 at 256² planes; below
    # ~Nc8/32² the gap swamps the sampling-noise floor)
    params = NARFParams(Nc=8, Nf=8, hidden_size=16, tri_plane_size=32,
                        render_bs=size * size, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        plane_sample_dtype="bfloat16", tile_patch=tile_patch)
    gen = TriNARFGenerator(nerf_params=params, size=size, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           z_dim=16, crop_background=True,
                           train_ray_chunk=size * size // 2)
    pose_cam, world, bl, inv_K, canonical, _ = ge._tiny_scene(1, size)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (1, 16 * 4))
    args = (rng, jnp.asarray(pose_cam), jnp.asarray(world), jnp.asarray(bl),
            z, jnp.asarray(inv_K))
    variables = gen.init(rng, *args)
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))
    return gen, variables, args


def test_gan_forward_tiled_matches_exact_and_trains():
    """TriNARFGenerator with tile_patch: forward parity vs the exact path
    (same init; the paths share every parameter) + grads flow in train
    mode through the chunked tiled scan."""
    gen_t, var_t, args = build_gan(tile_patch=4)
    gen_e, _, _ = build_gan(tile_patch=0)

    def psnr(a, b):
        mse = float(((np.asarray(a) - np.asarray(b)) ** 2).mean())
        return 20 * np.log10(2.0) - 10 * np.log10(max(mse, 1e-12))

    img_t, mask_t, aux_t = jax.jit(gen_t.apply)(var_t, *args)
    img_e, mask_e, aux_e = jax.jit(gen_e.apply)(var_t, *args)
    assert np.isfinite(np.asarray(img_t)).all()
    # parity is asserted on the FOREGROUND: the composite multiplies
    # mask-silhouette differences by a random-init background, which at
    # toy Nc (pooled depth bins can miss a thin density interval a
    # per-ray sampler catches) swamps the signal. Self-calibrated bar:
    # the exact path's own seed-to-seed variance (stochastic fine
    # sampler) is the noise floor; tiled must sit within a few dB of it.
    args_b = (jax.random.PRNGKey(9),) + args[1:]
    _, _, aux_e2 = jax.jit(gen_e.apply)(var_t, *args_b)
    floor = psnr(aux_e["fg_color"], aux_e2["fg_color"])
    got = psnr(aux_t["fg_color"], aux_e["fg_color"])
    assert got > floor - 3.0, f"tiled {got:.2f} dB vs noise floor {floor:.2f}"
    assert float(np.abs(np.asarray(mask_t) - np.asarray(mask_e)).mean()) < 0.05

    def loss(params_tree):
        v = dict(var_t, params=params_tree)
        (img, mask, aux), _ = gen_t.apply(v, *args, train=True,
                                          mutable=["stats"])
        return (img ** 2).mean() + (aux["fine_weights"] ** 2).mean()

    g = jax.jit(jax.grad(loss))(var_t["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0


def test_patch_based_sampler_structure_and_bias():
    """Selected rays come as whole P×P patches in patch-major order, and
    patches near the foreground mask win (same dilation bias as
    mask_based_sampler)."""
    from enarf_gan_tpu.nerf.ray_sampler import patch_based_sampler
    P, size, n_rays = 4, 64, 256
    mask = jnp.zeros((2, size, size)).at[:, 8:16, 8:16].set(1.0)
    ray_idx, homo = patch_based_sampler(jax.random.PRNGKey(0), mask,
                                        n_rays, P)
    assert ray_idx.shape == (2, n_rays) and homo.shape == (2, 1, 3, n_rays)
    ri = np.asarray(ray_idx).reshape(2, n_rays // (P * P), P, P)
    ys, xs = ri // size, ri % size
    # each group is a contiguous P×P pixel block
    assert (ys == ys[:, :, :, :1]).all() and (xs == xs[:, :, :1, :]).all()
    assert (np.diff(xs, axis=3) == 1).all() and (np.diff(ys, axis=2) == 1).all()
    assert (ys % P == np.arange(P).reshape(1, 1, P, 1)).all()
    # dilation radius 64 covers the whole 64² image ⇒ every patch competes;
    # shrink the scale to check bias: far-away mask on a bigger canvas
    size2 = 256
    mask2 = jnp.zeros((1, size2, size2)).at[:, :32, :32].set(1.0)
    ray_idx2, _ = patch_based_sampler(jax.random.PRNGKey(1), mask2,
                                      64 * 16, P)
    ys2, xs2 = np.asarray(ray_idx2) // size2, np.asarray(ray_idx2) % size2
    # all selected patches inside the dilated (radius-64) square
    assert ys2.max() < 32 + 64 + P and xs2.max() < 32 + 64 + P


def test_dso_train_forward_tiled():
    """DSO training forward with tile_patch: patch sampler + tiled render;
    finite outputs, photometric-style grads flow to the planes."""
    import __graft_entry__ as ge
    params = NARFParams(Nc=8, Nf=8, hidden_size=16, tri_plane_size=32,
                        render_bs=256, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=False, constant_triplane=True,
                        time_conditional=True, pose_conditional=False,
                        plane_sample_dtype="bfloat16", tile_patch=4)
    gen = DSONARFGenerator(nerf_params=params, size=SIZE, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=256)
    pose_cam, world, bl, inv_K, canonical, K = ge._tiny_scene(1, SIZE)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    mask = jnp.ones((1, SIZE, SIZE))
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]), mask, ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))

    def loss(params_tree):
        v = dict(variables, params=params_tree)
        color, m, ray_idx, _ = gen.apply(
            v, rng, jnp.asarray(pose_cam), jnp.asarray(world[:, 0, :3, :3]),
            mask, ft, jnp.asarray(bl), jnp.asarray(inv_K))
        return (color ** 2).mean() + (m ** 2).mean()

    val, g = jax.jit(jax.value_and_grad(loss))(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0


def test_tile_patch_falls_back_for_selector_variants():
    """tile_patch with a selector variant (no per-bone mask planes to
    window) must fall back to the exact path, not crash or silently apply
    candidate selection the config disabled."""
    import __graft_entry__ as ge
    params = NARFParams(Nc=4, Nf=4, hidden_size=16, tri_plane_size=16,
                        render_bs=SIZE * SIZE, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        constant_triplane=True, time_conditional=True,
                        pose_conditional=False, no_selector=True,
                        plane_sample_dtype="bfloat16", tile_patch=4)
    gen = DSONARFGenerator(nerf_params=params, size=SIZE, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=64)
    pose_cam, world, bl, inv_K, canonical, K = ge._tiny_scene(1, SIZE)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    mask = jnp.ones((1, SIZE, SIZE))
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]), mask, ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))
    color, m, ray_idx, _ = gen.apply(
        variables, rng, jnp.asarray(pose_cam),
        jnp.asarray(world[:, 0, :3, :3]), mask, ft, jnp.asarray(bl),
        jnp.asarray(inv_K))
    assert np.isfinite(np.asarray(color)).all()
    # full renderer falls back too (would assert in pack_planes_tiled)
    from enarf_gan_tpu.models.generator import make_dso_full_renderer
    render = make_dso_full_renderer(gen, SIZE, ray_batchsize=SIZE * SIZE,
                                    with_camera_pose=False)
    c, mm, dd = render(variables, rng, jnp.asarray(pose_cam),
                       jnp.asarray(inv_K), ft, jnp.asarray(bl))
    assert np.isfinite(np.asarray(c)).all()


def test_tiled_render_matches_exact():
    from conftest import perturb_params
    gen, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=4)
    variables = perturb_params(variables)
    rng = jax.random.PRNGKey(3)
    args = (variables, rng, jnp.asarray(pose_cam), jnp.asarray(inv_K), ft,
            jnp.asarray(bl))
    c_t, m_t, d_t = jax.jit(
        lambda *a: dso_render_entire_img_tiled(gen, *a, render_size=SIZE,
                                               ray_batchsize=SIZE * SIZE)
    )(*args)
    c_e, m_e, d_e = jax.jit(
        lambda *a: dso_render_entire_img(gen, *a, render_size=SIZE,
                                         ray_batchsize=SIZE * SIZE)
    )(*args)
    c_t, m_t, c_e, m_e = map(np.asarray, (c_t, m_t, c_e, m_e))
    assert np.isfinite(c_t).all() and np.isfinite(m_t).all()
    # the render must have real structure (see conftest.perturb_params) —
    # an all-zero mask makes every comparison below vacuous
    assert (m_e > 0.05).sum() > 200, f"degenerate fg: {(m_e > 0.05).sum()}"
    # both paths agree where both consider the ray valid; sampling-pattern
    # differences show up as small residuals, not structure
    # (measured with perturbed params: 38.9 dB vs the exact path's own
    # 40.0 dB seed-to-seed floor; mask mean-abs-diff 0.093)
    mse = float(((c_t - c_e) ** 2).mean())
    psnr = 20 * np.log10(2.0) - 10 * np.log10(max(mse, 1e-12))
    assert psnr > 24.0, f"tiled vs exact PSNR {psnr:.2f} dB"
    assert float(np.abs(m_t - m_e).mean()) < 0.15


def test_tiled_coarse_corners_matches_full_tiled():
    """tile_coarse_corners (coarse pass on the patch's 4 corner rays) must
    track the full-member tiled render closely: the coarse pass only
    steers the patch-pooled importance depths, which are already pooled
    patch-wide. Compared against the tiled path's own seed-to-seed noise
    floor (stochastic fine sampler)."""
    from conftest import perturb_params
    gen_c, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=4,
                                                        coarse_corners=True)
    gen_f, _, _ = build(tile_patch=4)
    variables = perturb_params(variables)

    def render(gen, seed):
        return jax.jit(
            lambda *a: dso_render_entire_img_tiled(
                gen, *a, render_size=SIZE, ray_batchsize=SIZE * SIZE)
        )(variables, jax.random.PRNGKey(seed), jnp.asarray(pose_cam),
          jnp.asarray(inv_K), ft, jnp.asarray(bl))

    def psnr(a, b):
        mse = float(((np.asarray(a) - np.asarray(b)) ** 2).mean())
        return 20 * np.log10(2.0) - 10 * np.log10(max(mse, 1e-12))

    c_c, m_c, _ = render(gen_c, 3)
    c_f, m_f, _ = render(gen_f, 3)
    c_f2, _, _ = render(gen_f, 9)
    assert np.isfinite(np.asarray(c_c)).all()
    # real structure required (see conftest.perturb_params)
    assert (np.asarray(m_f) > 0.05).sum() > 200, "degenerate fg"
    # measured with perturbed params: corners 40.6 dB vs the tiled path's
    # own 39.3 dB seed floor — corners sits WITHIN the noise floor
    floor = psnr(c_f, c_f2)          # fine-resample stochasticity
    got = psnr(c_c, c_f)
    assert floor > 20.0, f"tiled seed floor degenerate: {floor:.2f} dB"
    assert got > floor - 3.0, f"corners {got:.2f} dB vs floor {floor:.2f}"
    assert float(np.abs(np.asarray(m_c) - np.asarray(m_f)).mean()) < 0.12


def test_ablation_branches_shapes(monkeypatch):
    """ENARF_ABLATE=sampler/heads stand-ins keep density_color_tiled's
    output shapes/dtypes, including with_stats=True — the bench
    decomposition modes must not bitrot (ADVICE r2: the sampler ablation
    used to IndexError on the stats read)."""
    gen, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=4)
    rng = jax.random.PRNGKey(0)
    z = gen.apply(variables, ft, jnp.asarray(pose_cam), method="get_latents")
    pose_t, bl_t = gen.apply(variables, jnp.asarray(pose_cam),
                             jnp.asarray(bl), method="transform_pose")
    planes = gen.apply(variables, z, bl_t, method="compute_tri_plane_feature")
    tables = gen.apply(variables, planes, method="pack_planes_tiled")
    n_patch, m, S = 4, 16, 8
    pts = jax.random.uniform(rng, (1, 3, n_patch * m * S), jnp.float32, -1, 1)
    pose_scaled = pose_t.at[:, :, :3, 3].multiply(3.0)

    def run(with_stats):
        out = gen.apply(variables, pts, pose_scaled, bl_t, tables, z,
                        n_patch, m, S, ray_direction=None,
                        with_stats=with_stats,
                        method="nerf_density_color_tiled")
        return out if with_stats else out + (None,)

    ref = run(True)
    for stage in ("sampler", "heads"):
        monkeypatch.setenv("ENARF_ABLATE", stage)
        for with_stats in (False, True):
            density, color, aux = run(with_stats)
            assert density.shape == ref[0].shape
            assert color.shape == ref[1].shape
            assert np.isfinite(np.asarray(density)).all()
            assert np.isfinite(np.asarray(color)).all()
            if with_stats:
                assert np.isfinite(float(aux["tilewin_stats"]["clamped"]))
            else:
                assert aux is None
    monkeypatch.delenv("ENARF_ABLATE")
