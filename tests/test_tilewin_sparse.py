"""Tilewin robustness on realistic SPARSE geometry (VERDICT r2 #5).

The clamped-fetch fraction (~0.03%) and candidate-capacity leak (~0-3%)
were only ever measured on the dense synthetic bench scene, where the
subject fills ~87% of the frame at ~1 plane texel per pixel step. Sparse
frames (subject small in frame — the ZJU/SURREAL regime) have MORE plane
texels per pixel step, so 4×4-pixel patch windows overflow the 8-texel
window: measured 18.8% clamped fetches at P=4 on this fixture (vs 0.03%
dense). At P=2 the spread halves and clamping returns to ~0. These tests
pin that policy: on sparse geometry P=2 must meet hard bounds (clamped
< 1%, whole-point drop < 2%), and P=4 must keep failing loudly via the
coverage stats (if P=4 ever passes here, the policy note in PERF.md is
stale and tile_patch=4 becomes safe everywhere).

Mid-scale estimator parity (64², Nc24/Nf32, P=4) runs at bench-like
texel locality — the regime tile_patch=4 is actually used in.

Reference estimator semantics: libraries/NeRF/rendering.py:138-224.
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

SIZE = 64
TS = 128            # tri-plane resolution (keeps the CPU pack small)
NC, NF = 24, 32


def _scene(size, focal_scale):
    """__graft_entry__._tiny_scene with a configurable focal length:
    focal_scale 1.2 reproduces the dense bench framing; 0.5 pulls the
    camera angle wide so the subject covers only ~15-35% of pixels."""
    from enarf_gan_tpu.data.fixtures import (synthetic_rest_joints,
                                             synthetic_pose_sequence,
                                             camera_ring)
    from enarf_gan_tpu.geometry.smpl import canonical_pose_from_rest_joints
    rest = synthetic_rest_joints()
    world = synthetic_pose_sequence(rest, 1)
    extr = camera_ring(1)
    pose_cam = np.einsum("bij,bkjl->bkil", extr, world).astype(np.float32)
    pose_cam[:, :, 3, :] = [0, 0, 0, 1]
    focal = size * focal_scale
    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1]],
                 np.float32)
    coord = world[:, :, :3, 3]
    bl = np.linalg.norm(coord[:, 1:] - coord[:, SMPL_PARENTS[1:]],
                        axis=2)[:, :, None].astype(np.float32)
    canonical = canonical_pose_from_rest_joints(rest)
    return (pose_cam, world.astype(np.float32), bl, np.linalg.inv(K),
            canonical, K)


def _build(tile_patch, focal_scale):
    params = NARFParams(Nc=NC, Nf=NF, hidden_size=16, tri_plane_size=TS,
                        render_bs=SIZE * SIZE, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=False, constant_triplane=True,
                        time_conditional=True, pose_conditional=False,
                        plane_sample_dtype="bfloat16", tile_patch=tile_patch)
    gen = DSONARFGenerator(nerf_params=params, size=SIZE, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=256)
    pose_cam, world, bl, inv_K, canonical, _ = _scene(SIZE, focal_scale)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]),
                         jnp.ones((1, SIZE, SIZE)), ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))
    return gen, variables, (pose_cam, bl, inv_K, ft)


def _patch_geometry(gen, variables, pose_cam, bl, inv_K, P):
    """Patch-major coarse points exactly as nerf/tiled.py's coarse pass
    builds them (patch-pooled depth range, Nc patch-common bins)."""
    from enarf_gan_tpu.nerf.rendering import decide_frustum_range
    from enarf_gan_tpu.nerf.ray_sampler import image_grid_coords
    from enarf_gan_tpu.nerf.tiled import tile_permutation, _pool_patch

    m = P * P
    n = SIZE * SIZE
    n_patch = n // m
    perm = jnp.asarray(tile_permutation(SIZE, P))
    _, img_coord = image_grid_coords(SIZE, SIZE, 1)
    img_coord = img_coord[..., perm]

    pose_t, bl_t = gen.apply(variables, jnp.asarray(pose_cam),
                             jnp.asarray(bl), method="transform_pose")
    pose_scaled = pose_t.at[:, :, :3, 3].multiply(3.0)
    dmin, dmax, ray_dir, validity = decide_frustum_range(
        img_coord, pose_scaled, jnp.asarray(inv_K), 0.3, 5.0)
    val = validity.reshape(1, n)
    fg_frac = float(np.asarray(val).mean())

    big = jnp.float32(1e9)
    dmin_p = _pool_patch(dmin.reshape(1, n), m, jnp.min, big, val)
    dmax_p = _pool_patch(dmax.reshape(1, n), m, jnp.max, -big, val)
    any_valid = dmin_p < big
    dmin_p = jnp.where(any_valid, dmin_p, 0.3)
    dmax_p = jnp.where(any_valid, dmax_p, 5.0)
    bins = jnp.linspace(0.0, 1.0, NC + 1).reshape(1, 1, NC + 1)
    cd = dmin_p[:, :, None] * (1 - bins) + dmax_p[:, :, None] * bins
    cd_mid = (cd[..., 1:] + cd[..., :-1]) / 2
    rd3 = ray_dir.reshape(1, 3, n_patch, m)
    pts = (rd3[..., None] * cd_mid[:, None, :, None, :]).reshape(1, 3, -1)
    return pts, pose_scaled, bl_t, n_patch, m, fg_frac


def _window_stats(gen, variables, pose_cam, bl, inv_K, P):
    """(fg_frac, clamped_frac, point_drop_frac) for P×P patch windows.

    Geometry-only: computes window bases and member offsets exactly as
    ops/tilewin.py::sample_tilewin does (member_texels + group_bases),
    without running the sampler — the stats are identical to the sampler's
    ``coverage_stats`` and this keeps the test minutes-scale on 1 CPU.

    * clamped: valid member-plane fetches whose quad falls outside the
      group's 8-texel window (sampled values are edge-clamped → wrong).
    * point_drop: valid points (≥1 valid bone) whose every valid bone
      missed all Mp patch slots (point renders as empty space). The
      per-(point, bone) capacity is Mp=4 by config in BOTH the exact and
      tiled paths, so whole-point drop is the artifact-level metric.
    """
    from enarf_gan_tpu.ops.tilewin import (select_patch_slots, member_texels,
                                           group_bases, _num_bases, WIN)
    from enarf_gan_tpu.geometry.encoding import in_cube

    pts, pose_scaled, bl_t, n_patch, m, fg = _patch_geometry(
        gen, variables, pose_cam, bl, inv_K, P)

    def probe(mdl, position):
        local, canonical = mdl.nerf.to_local_and_canonical(
            position, pose_scaled, bl_t)
        validity = in_cube(local)
        validity = validity & (jnp.abs(canonical) < 1).all(axis=2)
        slot_idx, cand_pos, cand_valid = select_patch_slots(
            canonical, validity, n_patch, m, NC,
            mdl.nerf.params.max_bones_per_point)
        return validity, cand_pos, cand_valid

    validity, cand_pos, cand_valid = jax.jit(
        lambda v, p: gen.apply(v, p, method=lambda mdl, pp: probe(mdl, pp))
    )(variables, pts)

    B, _, Mp, np_, mm, S = cand_pos.shape
    n = np_ * mm * S
    cp = cand_pos.reshape(B, 3, Mp, n)
    py, px, _, _ = member_texels(cp, TS)
    pym = py.reshape(B, 3, Mp, np_, mm, S)
    pxm = px.reshape(B, 3, Mp, np_, mm, S)
    vm = jnp.broadcast_to(cand_valid[:, None], (B, 3, Mp, np_, mm, S))
    bt, bs = group_bases(pym, pxm, vm, _num_bases(TS))
    dt = pym - bt[:, :, :, :, None]
    ds = pxm - bs[:, :, :, :, None]
    clamped = ((dt < 0) | (dt > WIN - 2) | (ds < 0) | (ds > WIN - 2)) & vm
    clamped_frac = float(clamped.sum() / jnp.maximum(vm.sum(), 1))

    point_valid = np.asarray(validity.any(axis=1)).reshape(-1)   # (n,)
    covered = np.asarray(cand_valid.any(axis=1)).reshape(-1)     # (n,)
    n_valid = int(point_valid.sum())
    assert n_valid > 1000, "fixture degenerate: almost no valid points"
    drop_frac = float((point_valid & ~covered).sum() / n_valid)
    return fg, clamped_frac, drop_frac


def test_sparse_frame_p2_meets_bounds_p4_does_not():
    gen, variables, (pose_cam, bl, inv_K, ft) = _build(tile_patch=0,
                                                       focal_scale=0.5)
    fg, cl4, drop4 = _window_stats(gen, variables, pose_cam, bl, inv_K, P=4)
    # the fixture must actually be in the sparse-frame regime
    assert 0.05 < fg < 0.40, f"fixture fg fraction {fg:.3f}"
    # P=4 overflows the window here — the failure mode this test exists
    # to keep visible (if this drops below the bound, tile_patch=4 became
    # safe on sparse frames; update PERF.md's policy note)
    assert cl4 > 0.05, f"P=4 clamped {cl4:.4f} — sparse regime now safe?"

    fg2, cl2, drop2 = _window_stats(gen, variables, pose_cam, bl, inv_K, P=2)
    assert cl2 < 0.01, f"P=2 clamped-fetch fraction {cl2:.4f} >= 1%"
    assert drop2 < 0.02, f"P=2 whole-point drop {drop2:.4f} >= 2%"
    assert drop4 < 0.10, f"P=4 whole-point drop {drop4:.4f} >= 10%"


def test_midscale_tiled_vs_exact_psnr():
    """Mid-scale (64², Nc24/Nf32) full-frame parity at bench-like texel
    locality (focal 1.2 — the regime tile_patch=4 is used in)."""
    gen_t, var_t, (pose_cam, bl, inv_K, ft) = _build(tile_patch=4,
                                                     focal_scale=1.2)
    gen_e, _, _ = _build(tile_patch=0, focal_scale=1.2)
    rng = jax.random.PRNGKey(3)
    args = (var_t, rng, jnp.asarray(pose_cam), jnp.asarray(inv_K), ft,
            jnp.asarray(bl))
    c_t, m_t, _ = jax.jit(
        lambda *a: dso_render_entire_img_tiled(gen_t, *a, render_size=SIZE,
                                               ray_batchsize=SIZE * SIZE)
    )(*args)
    c_e, m_e, _ = jax.jit(
        lambda *a: dso_render_entire_img(gen_e, *a, render_size=SIZE,
                                         ray_batchsize=SIZE * SIZE)
    )(*args)
    c_t, m_t, c_e, m_e = map(np.asarray, (c_t, m_t, c_e, m_e))
    assert np.isfinite(c_t).all() and np.isfinite(m_t).all()
    mse = float(((c_t - c_e) ** 2).mean())
    psnr = 20 * np.log10(2.0) - 10 * np.log10(max(mse, 1e-12))
    assert psnr > 26.0, f"mid-scale tiled vs exact PSNR {psnr:.2f} dB"
    assert float(np.abs(m_t - m_e).mean()) < 0.03
