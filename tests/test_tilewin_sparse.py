"""Tilewin coverage contract on SPARSE (ZJU-like) geometry.

The round-2 coverage numbers (clamped fetches ~0.03%, candidate-capacity
leak ~0-3%) were measured only on the dense synthetic bench scene where
~87% of rays hit a bone cube. Real ZJU/SURREAL frames are far sparser
(fg ≈ 10-20% of pixels) with different patch statistics: patches straddle
the silhouette, pooled depth ranges widen, and per-pixel angular footprint
relative to the tri-plane texel grid changes the window spread. This test
builds such a frame (zoomed-out camera → fg ≈ 10-20%) and asserts the
sampler's coverage bounds there, plus tiled-vs-exact parity at mid scale
(64², Nc24/Nf32 — VERDICT r2 #5; the 32² tests live in
test_tiled_render.py). Estimator semantics under test match reference
libraries/NeRF/rendering.py:138-224.
"""
import numpy as np
import jax
import jax.numpy as jnp

from enarf_gan_tpu.models.narf import NARFParams
from enarf_gan_tpu.models.generator import (DSONARFGenerator,
                                            register_canonical_pose,
                                            dso_render_entire_img,
                                            dso_render_entire_img_tiled)
from enarf_gan_tpu.geometry.smpl import SMPL_PARENTS

SIZE, TS, NC, NF, P = 64, 32, 24, 32, 4
# bench scene uses 1.2 → fg shrinks ~12x in area (ZJU-like occupancy).
# TS=32 keeps the texels-per-body-pixel ratio at real-dataset levels
# (~1.5 texels/px here vs ZJU's 256 texels over a ~250 px subject ≈ 1.0;
# the window-spread regime scales with exactly this ratio — a TS that
# over-resolves a 20 px subject is not a configuration any shipped
# dataset config reaches).
FOCAL_SCALE = 0.35


def build(tile_patch):
    import __graft_entry__ as ge
    params = NARFParams(Nc=NC, Nf=NF, hidden_size=16, tri_plane_size=TS,
                        render_bs=SIZE * SIZE, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=False, constant_triplane=True,
                        time_conditional=True, pose_conditional=False,
                        plane_sample_dtype="bfloat16", tile_patch=tile_patch)
    gen = DSONARFGenerator(nerf_params=params, size=SIZE, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=SIZE * SIZE)
    pose_cam, world, bl, inv_K, canonical, K = ge._tiny_scene(
        1, SIZE, focal_scale=FOCAL_SCALE)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]),
                         jnp.ones((1, SIZE, SIZE)), ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))
    return gen, variables, (pose_cam, bl, inv_K, ft)


def _sparse_frame_stats():
    """Run the tilewin geometry chain on the sparse frame's patch-ordered
    coarse points (the same construction as nerf/tiled.py's coarse pass)
    and return (fg_fraction, clamped_fraction, capacity_leak)."""
    from enarf_gan_tpu.nerf.tiled import tile_permutation, _pool_patch
    from enarf_gan_tpu.nerf.rendering import decide_frustum_range
    from enarf_gan_tpu.geometry.encoding import in_cube
    from enarf_gan_tpu.nerf.ray_sampler import whole_image_grid_ray_sampler
    from enarf_gan_tpu.ops.tilewin import select_patch_slots, sample_tilewin

    gen, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=P)
    m = P * P
    n = SIZE * SIZE
    n_patch = n // m
    perm = tile_permutation(SIZE, P)
    _, img_coord = whole_image_grid_ray_sampler(SIZE, SIZE, 1)
    coord_t = jnp.asarray(img_coord)[..., perm]

    pose_t, bl_t = gen.apply(variables, jnp.asarray(pose_cam),
                             jnp.asarray(bl), method="transform_pose")
    pose_scaled = pose_t.at[:, :, :3, 3].multiply(3.0)
    dmin, dmax, ray_dir, validity = decide_frustum_range(
        coord_t, pose_scaled, jnp.asarray(inv_K), 0.3, 5.0)
    fg = float(validity.mean())

    # patch-pooled coarse bins over valid member rays (nerf/tiled.py)
    val = validity.reshape(1, n)
    big = jnp.float32(1e9)
    dmin_p = _pool_patch(dmin.reshape(1, n), m, jnp.min, big, val)
    dmax_p = _pool_patch(dmax.reshape(1, n), m, jnp.max, -big, val)
    ok = dmin_p < big
    dmin_p = jnp.where(ok, dmin_p, 0.3)
    dmax_p = jnp.where(ok, dmax_p, 5.0)
    bins = jnp.linspace(0.0, 1.0, NC + 1).reshape(1, 1, NC + 1)
    cd = dmin_p[:, :, None] * (1 - bins) + dmax_p[:, :, None] * bins
    cd_mid = (cd[..., 1:] + cd[..., :-1]) / 2                 # (1, np, NC)
    rd3 = ray_dir.reshape(1, 3, n_patch, m)
    pts = (rd3[..., None] * cd_mid[:, None, :, None, :]).reshape(1, 3, -1)

    local, canon = gen.apply(
        variables, pts, pose_scaled, bl_t,
        method=lambda mod, *a: mod.nerf.to_local_and_canonical(*a))
    point_valid = in_cube(local) & (jnp.abs(canon) < 1).all(axis=2)
    slot_idx, cand_pos, cand_valid = select_patch_slots(
        canon, point_valid, n_patch, m, NC, 4)

    # capacity leak: members valid for SOME bone but covered by NO slot
    valid_any = point_valid.any(axis=1).reshape(1, n_patch, m, NC)
    covered = cand_valid.any(axis=1)                      # (1, np, m, NC)
    leak = float((valid_any & ~covered).sum()) / max(float(valid_any.sum()),
                                                     1.0)

    z = gen.apply(variables, ft, jnp.asarray(pose_cam), method="get_latents")
    planes = gen.apply(variables, z, bl_t,
                       method="compute_tri_plane_feature")
    tables = gen.apply(variables, planes, method="pack_planes_tiled")
    _, _, stats = sample_tilewin(tables, cand_pos, slot_idx, cand_valid,
                                 with_stats=True)
    return fg, float(stats["clamped"]), leak


def test_sparse_frame_coverage_bounds():
    fg, clamped, leak = _sparse_frame_stats()
    # the fixture must actually be sparse — ZJU-like fg occupancy
    assert 0.03 < fg < 0.30, f"fixture not sparse: fg={fg:.3f}"
    assert clamped < 0.01, f"clamped fetch fraction {clamped:.4f} >= 1%"
    assert leak < 0.05, f"candidate-capacity leak {leak:.4f} >= 5%"


def test_sparse_midscale_tiled_matches_exact():
    """64² Nc24/Nf32 tiled-vs-exact parity on the sparse frame, judged on
    foreground pixels against the exact path's own seed-to-seed noise
    floor (the stochastic fine sampler bounds achievable agreement)."""
    gen_t, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=P)
    gen_e, _, _ = build(tile_patch=0)

    def render(gen, tiled, seed):
        f = dso_render_entire_img_tiled if tiled else dso_render_entire_img
        return jax.jit(
            lambda *a: f(gen, *a, render_size=SIZE,
                         ray_batchsize=SIZE * SIZE)
        )(variables, jax.random.PRNGKey(seed), jnp.asarray(pose_cam),
          jnp.asarray(inv_K), ft, jnp.asarray(bl))

    c_t, m_t, _ = render(gen_t, True, 3)
    c_e, m_e, _ = render(gen_e, False, 3)
    c_e2, _, _ = render(gen_e, False, 9)
    c_t, c_e, c_e2, m_t, m_e = map(np.asarray, (c_t, c_e, c_e2, m_t, m_e))
    assert np.isfinite(c_t).all() and np.isfinite(m_t).all()

    fgmask = (m_e > 0.05)[None]                          # (1, H, W)
    npix = max(int(fgmask.sum()), 1)

    def psnr_fg(a, b):
        mse = float((((a - b) ** 2) * fgmask).sum()) / (3 * npix)
        return 20 * np.log10(2.0) - 10 * np.log10(max(mse, 1e-12))

    floor = psnr_fg(c_e, c_e2)
    got = psnr_fg(c_t, c_e)
    assert got > floor - 3.0, f"tiled {got:.2f} dB vs floor {floor:.2f} dB"
    assert float(np.abs(m_t - m_e).mean()) < 0.05
