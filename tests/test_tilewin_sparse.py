"""Tilewin coverage contract on SPARSE (ZJU-like) geometry.

The round-2 coverage numbers (clamped fetches ~0.03%, candidate-capacity
leak ~0-3%) were measured only on the dense synthetic bench scene where
~87% of rays hit a bone cube. Real ZJU/SURREAL frames are far sparser
(fg ≈ 10-20% of pixels) with different patch statistics: patches straddle
the silhouette, pooled depth ranges widen, and per-pixel angular footprint
relative to the tri-plane texel grid changes the window spread. Two
regimes are pinned:

* LOW texels-per-pixel (TS=32 here ≈ ZJU's ~1.0 texel per body pixel —
  what the shipped dataset configs actually reach): tile_patch=4 must meet
  hard coverage bounds (clamped < 1%, leak < 4%), and the slot-selection
  rescue term must measurably cut the capacity leak vs RESCUE_W=0.
* HIGH texels-per-pixel (TS=128 over a ~20 px subject — a zoomed-out
  subject on production-resolution planes): 4×4 patches overflow the
  8-texel window and the coverage stats must KEEP SAYING SO loudly
  (clamped > 5% at P=4) while P=2 stays within hard bounds. If the P=4
  assertion ever fails, window geometry changed and PERF.md's
  patch-size policy note must be re-derived — do not silently relax it.

Plus tiled-vs-exact parity at mid scale (64², Nc24/Nf32 — VERDICT r2 #5;
the 32² tests live in test_tiled_render.py). Estimator semantics under
test match reference libraries/NeRF/rendering.py:138-224.
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
# the window-spread regime scales with exactly this ratio).
FOCAL_SCALE = 0.35
TS_HIGH = 128      # high-ratio regime: production planes, tiny subject


def build(tile_patch, ts=TS, focal_scale=FOCAL_SCALE):
    import __graft_entry__ as ge
    params = NARFParams(Nc=NC, Nf=NF, hidden_size=16, tri_plane_size=ts,
                        render_bs=SIZE * SIZE, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=False, constant_triplane=True,
                        time_conditional=True, pose_conditional=False,
                        plane_sample_dtype="bfloat16", tile_patch=tile_patch)
    gen = DSONARFGenerator(nerf_params=params, size=SIZE, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=SIZE * SIZE)
    pose_cam, world, bl, inv_K, canonical, K = ge._tiny_scene(
        1, SIZE, focal_scale=focal_scale)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]),
                         jnp.ones((1, SIZE, SIZE)), ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))
    return gen, variables, (pose_cam, bl, inv_K, ft)


def _patch_points(gen, variables, pose_cam, bl, inv_K, patch):
    """Patch-major coarse points exactly as nerf/tiled.py's coarse pass
    builds them (patch-pooled depth range, NC patch-common bins).
    Returns (fg_frac, canon (B,K,3,n), point_valid (B,K,n), n_patch, m)."""
    from enarf_gan_tpu.nerf.tiled import tile_permutation, _pool_patch
    from enarf_gan_tpu.nerf.rendering import decide_frustum_range
    from enarf_gan_tpu.geometry.encoding import in_cube
    from enarf_gan_tpu.nerf.ray_sampler import whole_image_grid_ray_sampler

    m = patch * patch
    n = SIZE * SIZE
    n_patch = n // m
    perm = tile_permutation(SIZE, patch)
    _, img_coord = whole_image_grid_ray_sampler(SIZE, SIZE, 1)
    coord_t = jnp.asarray(img_coord)[..., perm]

    pose_t, bl_t = gen.apply(variables, jnp.asarray(pose_cam),
                             jnp.asarray(bl), method="transform_pose")
    pose_scaled = pose_t.at[:, :, :3, 3].multiply(3.0)
    dmin, dmax, ray_dir, validity = decide_frustum_range(
        coord_t, pose_scaled, jnp.asarray(inv_K), 0.3, 5.0)
    fg = float(validity.mean())

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
    return fg, canon, point_valid, n_patch, m, (pose_scaled, bl_t)


def _window_stats(ts, patch):
    """(fg, clamped_frac, point_drop_frac) for patch×patch windows on the
    sparse frame at tri-plane resolution ts. Geometry-only (member_texels
    + group_bases, no sampler run): identical numbers to the sampler's
    coverage_stats, minutes-scale on 1 CPU even at TS=128."""
    from enarf_gan_tpu.ops.tilewin import (select_patch_slots, member_texels,
                                           group_bases, _num_bases, WIN)

    gen, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=0, ts=ts)
    fg, canon, point_valid, n_patch, m, _ = _patch_points(
        gen, variables, pose_cam, bl, inv_K, patch)
    slot_idx, cand_pos, cand_valid = select_patch_slots(
        canon, point_valid, n_patch, m, NC, 4)

    B, _, Mp, np_, mm, S = cand_pos.shape
    n = np_ * mm * S
    cp = cand_pos.reshape(B, 3, Mp, n)
    py, px, _, _ = member_texels(cp, ts)
    pym = py.reshape(B, 3, Mp, np_, mm, S)
    pxm = px.reshape(B, 3, Mp, np_, mm, S)
    vm = jnp.broadcast_to(cand_valid[:, None], (B, 3, Mp, np_, mm, S))
    bt, bs = group_bases(pym, pxm, vm, _num_bases(ts))
    dt = pym - bt[:, :, :, :, None]
    ds = pxm - bs[:, :, :, :, None]
    clamped = ((dt < 0) | (dt > WIN - 2) | (ds < 0) | (ds > WIN - 2)) & vm
    clamped_frac = float(clamped.sum() / jnp.maximum(vm.sum(), 1))

    pv = np.asarray(point_valid.any(axis=1)).reshape(-1)
    covered = np.asarray(cand_valid.any(axis=1)).reshape(-1)
    n_valid = int(pv.sum())
    assert n_valid > 1000, "fixture degenerate: almost no valid points"
    drop_frac = float((pv & ~covered).sum() / n_valid)
    return fg, clamped_frac, drop_frac


def _leak(canon, point_valid, n_patch, m):
    """Capacity leak: members valid for SOME bone but covered by NO slot."""
    from enarf_gan_tpu.ops.tilewin import select_patch_slots
    _, _, cand_valid = select_patch_slots(
        canon, point_valid, n_patch, m, NC, 4)
    valid_any = point_valid.any(axis=1).reshape(1, n_patch, m, NC)
    covered = cand_valid.any(axis=1)
    return float((valid_any & ~covered).sum()) / max(float(valid_any.sum()),
                                                     1.0)


def _sparse_frame_stats():
    """Full-sampler coverage stats on the low-ratio (shipped-config) sparse
    frame: (fg, clamped, leak_with_rescue, leak_without_rescue)."""
    from enarf_gan_tpu.ops.tilewin import select_patch_slots, sample_tilewin
    import enarf_gan_tpu.ops.tilewin as tw

    gen, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=P)
    fg, canon, point_valid, n_patch, m, (pose_scaled, bl_t) = _patch_points(
        gen, variables, pose_cam, bl, inv_K, P)
    slot_idx, cand_pos, cand_valid = select_patch_slots(
        canon, point_valid, n_patch, m, NC, 4)
    leak = _leak(canon, point_valid, n_patch, m)
    saved = tw.RESCUE_W
    try:
        tw.RESCUE_W = 0.0
        leak_norescue = _leak(canon, point_valid, n_patch, m)
    finally:
        tw.RESCUE_W = saved

    z = gen.apply(variables, ft, jnp.asarray(pose_cam), method="get_latents")
    planes = gen.apply(variables, z, bl_t,
                       method="compute_tri_plane_feature")
    tables = gen.apply(variables, planes, method="pack_planes_tiled")
    _, _, stats = sample_tilewin(tables, cand_pos, slot_idx, cand_valid,
                                 with_stats=True)
    return fg, float(stats["clamped"]), leak, leak_norescue


def test_sparse_frame_coverage_bounds():
    fg, clamped, leak, leak_norescue = _sparse_frame_stats()
    # the fixture must actually be sparse — ZJU-like fg occupancy
    assert 0.03 < fg < 0.30, f"fixture not sparse: fg={fg:.3f}"
    assert clamped < 0.01, f"clamped fetch fraction {clamped:.4f} >= 1%"
    assert leak < 0.04, f"candidate-capacity leak {leak:.4f} >= 4%"
    # the rescue term must be doing measurable work: reverting RESCUE_W
    # to 0 must cost coverage (pins the ~5% → <4% claim in tilewin.py)
    assert leak < leak_norescue, \
        f"rescue term inert: leak {leak:.4f} vs no-rescue {leak_norescue:.4f}"


def test_high_texel_ratio_p4_stays_loud_p2_safe():
    """The P=4-unsafe regime (production-resolution planes, zoomed-out
    subject) must stay VISIBLE through the coverage stats: P=4 overflows
    the 8-texel window loudly, P=2 meets the hard bounds. Regression guard
    for window geometry (WIN/STRIDE/group_bases) — if cl4 ever drops below
    the bound, tile_patch=4 became safe on sparse frames and PERF.md's
    patch-size policy note must be re-derived."""
    fg, cl4, drop4 = _window_stats(TS_HIGH, patch=4)
    assert 0.03 < fg < 0.30, f"fixture not sparse: fg={fg:.3f}"
    assert cl4 > 0.05, f"P=4 clamped {cl4:.4f} — sparse regime now safe?"
    assert drop4 < 0.10, f"P=4 whole-point drop {drop4:.4f} >= 10%"

    fg2, cl2, drop2 = _window_stats(TS_HIGH, patch=2)
    assert cl2 < 0.01, f"P=2 clamped-fetch fraction {cl2:.4f} >= 1%"
    assert drop2 < 0.02, f"P=2 whole-point drop {drop2:.4f} >= 2%"


def test_sparse_midscale_tiled_matches_exact():
    """64² Nc24/Nf32 tiled-vs-exact parity on the sparse frame, judged on
    foreground pixels against the exact path's own seed-to-seed noise
    floor. On SPARSE frames the patch-pooled estimator pays a real
    discretization cost beyond sampling noise — silhouette-straddling
    patches widen the pooled depth ranges — measured 5.8 dB below the
    exact floor on this fixture (39.45 vs 45.26 dB fg-PSNR, perturbed
    params; the dense 32² gap is ~1 dB, test_tiled_render.py). The bounds
    pin that budget: within 8 dB of the floor AND ≥32 dB absolute."""
    from conftest import perturb_params
    gen_t, variables, (pose_cam, bl, inv_K, ft) = build(tile_patch=P)
    gen_e, _, _ = build(tile_patch=0)
    variables = perturb_params(variables)

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
    npix = int(fgmask.sum())
    # a degenerate foreground (PSNR over a handful of pixels) must fail,
    # not silently pass
    assert npix > 200, f"degenerate fg mask: {npix} pixels"

    def psnr_fg(a, b):
        mse = float((((a - b) ** 2) * fgmask).sum()) / (3 * npix)
        return 20 * np.log10(2.0) - 10 * np.log10(max(mse, 1e-12))

    floor = psnr_fg(c_e, c_e2)
    got = psnr_fg(c_t, c_e)
    # the relative bound is vacuous if the exact path's own floor is low
    assert floor > 20.0, f"exact-path seed floor degenerate: {floor:.2f} dB"
    assert got > floor - 8.0, f"tiled {got:.2f} dB vs floor {floor:.2f} dB"
    assert got > 32.0, f"tiled fg-PSNR {got:.2f} dB < 32 dB absolute"
    assert float(np.abs(m_t - m_e).mean()) < 0.15
