"""ACROSS-RAY gather locality on real bench geometry (round-2 design probe).

analyze_gather_locality.py showed consecutive ALONG-RAY samples jump 10-25
texels — no locality. This measures the other axis: adjacent PIXELS at the
same (sample index, bone): their canonical positions differ by roughly
depth/focal ≈ a texel, so one supertile fetch (8 consecutive cells,
bench_unitable.py P3: 908 M rows-equiv/s vs 245-400 M single rows) could
serve a whole pixel patch.

For each (P×P pixel patch, sample index, bone, plane) group, computes the
cell bbox of the group's valid members and how often it fits a bt×bs cell
block — i.e. the shared-fetch hit rate — plus the resulting issue count vs
today's one-fetch-per-(point,candidate,plane).

Run (CPU is fine — geometry only): python tools/analyze_patch_locality.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_geometry(size=128, Nc=48, M=4, ts=256):
    from enarf_gan_tpu.models.narf import NARFParams
    from enarf_gan_tpu.models.generator import (DSONARFGenerator,
                                                register_canonical_pose)
    from enarf_gan_tpu.geometry.smpl import SMPL_PARENTS
    from enarf_gan_tpu.nerf.rendering import coarse_sample
    from enarf_gan_tpu.nerf.ray_sampler import whole_image_grid_ray_sampler
    from enarf_gan_tpu.ops.triplane import select_candidate_bones
    from enarf_gan_tpu.ops.quadtable import _quad_cells_weights
    from __graft_entry__ import _tiny_scene

    params = NARFParams(Nc=Nc, Nf=64, hidden_size=16, tri_plane_size=ts,
                        render_bs=4096, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=True, time_conditional=True,
                        pose_conditional=False)
    gen = DSONARFGenerator(nerf_params=params, size=size, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=256)
    pose_cam, world, bl, inv_K, canonical, K = _tiny_scene(1, size)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]),
                         jnp.ones((1, size, size)), ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))

    pose_t, bl_t = gen.apply(variables, jnp.asarray(pose_cam),
                             jnp.asarray(bl), method="transform_pose")
    pose_scaled = pose_t.at[:, :, :3, 3].multiply(params.coordinate_scale)

    grid, img_coord = whole_image_grid_ray_sampler(size, size, 1)
    (_, _, points, validity, dmin2, dmax2, start, end) = coarse_sample(
        img_coord, pose_scaled, jnp.asarray(inv_K), Nc=Nc)

    if os.environ.get("COMMON_DEPTH", "0") == "1":
        # patch-common depth bins (P=4): pool [dmin, dmax] over each 4x4
        # pixel patch (valid rays only) and resample — the tilepack
        # sampler's proposed binning. Spread across a patch then comes only
        # from the pixel-angle offset at a SHARED depth.
        P = int(os.environ.get("COMMON_P", "4"))
        dmin_h = np.asarray(dmin2[0, 0]).reshape(size, size)
        dmax_h = np.asarray(dmax2[0, 0]).reshape(size, size)
        val_h = np.asarray(validity[0, 0, 0]).reshape(size, size)
        rd = np.asarray(start[0]) / np.asarray(dmin2[0])  # (3, n) ray dirs

        def pool(x, fn, neutral):
            xp = np.where(val_h, x, neutral).reshape(size // P, P,
                                                     size // P, P)
            pooled = fn(fn(xp, axis=3), axis=1)  # (size/P, size/P)
            return np.repeat(np.repeat(pooled, P, 0), P, 1)

        dmin_p = pool(dmin_h, np.min, np.inf)
        dmax_p = pool(dmax_h, np.max, -np.inf)
        ok = np.isfinite(dmin_p) & np.isfinite(dmax_p)
        dmin_p = np.where(ok, dmin_p, dmin_h).reshape(-1)
        dmax_p = np.where(ok, dmax_p, dmax_h).reshape(-1)
        bins = np.linspace(0.0, 1.0, Nc + 1)
        d = dmin_p[:, None] * (1 - bins) + dmax_p[:, None] * bins  # (n,Nc+1)
        dm = (d[:, 1:] + d[:, :-1]) / 2                            # (n, Nc)
        pts = rd[:, :, None] * dm[None]                            # (3,n,Nc)
        points = jnp.asarray(pts.reshape(1, 3, -1), jnp.float32)

    def local_and_cells(variables, points):
        local, canon = gen.apply(
            variables, points, pose_scaled, bl_t,
            method=lambda m, *a: m.nerf.to_local_and_canonical(*a))
        B, K3, n = local.shape
        Kb = K3 // 3
        loc = local.reshape(B, Kb, 3, n)
        val = ((jnp.abs(loc) <= 1).all(axis=2)
               & (jnp.abs(canon) < 1).all(axis=2))
        cand_idx, cand_valid, cand_pos = select_candidate_bones(
            canon, val, M)
        cp = cand_pos.transpose(0, 3, 2, 1)  # (B, 3, M, n)
        cells, _wq = _quad_cells_weights(cp, ts, ts)  # (B,3,M,n) flat t*(W+1)+s
        return cells, cand_idx, cand_valid

    cells, cand_idx, cand_valid = jax.jit(local_and_cells)(variables, points)
    return (np.asarray(cells[0]), np.asarray(cand_idx[0]),
            np.asarray(cand_valid[0]), size, Nc, M, ts)


def analyze(cells, cand_idx, cand_valid, size, Nc, M, ts):
    Wp = ts + 1
    n = size * size * Nc
    # entry axes: plane(3), M, n  →  per-entry pixel, sample, bone
    pt = np.arange(n)
    ray = pt // Nc          # raster pixel id
    samp = pt % Nc
    py, px = ray // size, ray % size

    t = cells // Wp
    s = cells % Wp

    valid = np.broadcast_to(cand_valid.T[None], (3,) + cand_valid.T.shape)
    total_fetches = int(valid.sum())
    print(f"valid (pt,cand,plane) fetches: {total_fetches/1e6:.2f} M "
          f"(of {3*M*n/1e6:.2f} M slots, "
          f"{100*total_fetches/(3*M*n):.0f}%)")

    for P in (2, 4, 8):
        patch = (py // P) * (size // P) + (px // P)  # per point
        # group key per entry: (plane, bone, patch, samp)
        n_patch = (size // P) ** 2
        bone = cand_idx.T  # (M, n)
        key = (((np.arange(3)[:, None, None] * 24 + bone[None]) * n_patch
                + patch[None, None]) * Nc + samp[None, None])
        kf = key[valid]
        tf = t[valid]
        sf = s[valid]
        order = np.argsort(kf, kind="stable")
        kf, tf, sf = kf[order], tf[order], sf[order]
        starts = np.flatnonzero(np.r_[True, kf[1:] != kf[:-1]])
        ends = np.r_[starts[1:], len(kf)]
        gmin_t = np.minimum.reduceat(tf, starts)
        gmax_t = np.maximum.reduceat(tf, starts)
        gmin_s = np.minimum.reduceat(sf, starts)
        gmax_s = np.maximum.reduceat(sf, starts)
        gsize = ends - starts
        n_groups = len(starts)
        spread_t = gmax_t - gmin_t
        spread_s = gmax_s - gmin_s
        print(f"\nP={P}: {n_groups/1e6:.2f} M groups, "
              f"mean members {gsize.mean():.2f}")
        print(f"  spread t p50/p90/p99/p99.9/max: "
              f"{np.percentile(spread_t, [50, 90, 99, 99.9])} "
              f"{spread_t.max()}")
        print(f"  spread s p50/p90/p99/p99.9/max: "
              f"{np.percentile(spread_s, [50, 90, 99, 99.9])} "
              f"{spread_s.max()}")
        # member-level clamp fraction for a W×W window anchored at the
        # group's min cell (members beyond the window would be clamped in
        # the tilepack fast path; weight by group size)
        for W in (4, 6, 8, 12, 16):
            out_t = np.minimum(spread_t - (W - 1), 0) == 0  # spread > W-1
            out_frac = (gsize * ((spread_t > W - 1) | (spread_s > W - 1))
                        ).sum() / total_fetches
            del out_t
            print(f"  window {W:2d}x{W:2d}: groups-any-clamp "
                  f"{100*((spread_t > W-1)|(spread_s > W-1)).mean():5.2f}%  "
                  f"members-in-clamped-groups {100*out_frac:5.2f}%")
        if P == 4:
            # patch-candidate capacity: per (patch, sample), how many
            # distinct bones do members need (union), and what member
            # fraction survives keeping only the top-Mp bones by member
            # count — the tilewin slot-capacity / leak tradeoff
            pk = (patch * Nc + samp)[None].repeat(M, 0)  # (M, n)
            ps_key = pk[cand_valid.T] * 24 + bone[cand_valid.T]
            uniq, cnt = np.unique(ps_key, return_counts=True)
            ps_of = uniq // 24
            order2 = np.argsort(ps_of, kind="stable")
            ps_of, cnt2 = ps_of[order2], cnt[order2]
            st2 = np.flatnonzero(np.r_[True, ps_of[1:] != ps_of[:-1]])
            union = np.diff(np.r_[st2, len(ps_of)])
            hist = np.bincount(union, minlength=10)[:10]
            print(f"  patch-sample bone-union hist (1..9+): "
                  f"{hist[1:] / max(union.sum(), 1e-9)}")
            members_tot = cnt.sum()
            for Mp in (4, 5, 6, 8):
                kept = 0
                # per patch-sample keep Mp largest member-count bones
                for s0, e0 in zip(st2, np.r_[st2[1:], len(ps_of)]):
                    c = np.sort(cnt2[s0:e0])[::-1]
                    kept += c[:Mp].sum()
                print(f"  Mp={Mp}: member keep-rate "
                      f"{100*kept/members_tot:6.2f}%")
        # Supertile fetch model: table laid out (plane, t, s_block) with one
        # row = 8 consecutive s-cells (quad rows carry each cell's 2x2
        # bilinear corners, so covering the CELL covers the sample). A group
        # costs (t rows needed) x (8-aligned s-blocks needed) tile issues,
        # falling back to per-member row fetches when those are cheaper.
        tile_cost = ((spread_t + 1).astype(np.int64)
                     * (gmax_s // 8 - gmin_s // 8 + 1))
        cost = np.minimum(tile_cost, gsize)
        shared = tile_cost < gsize
        print(f"  tile-fetch issues {cost.sum()/1e6:6.2f} M "
              f"(vs {total_fetches/1e6:.2f} M direct = "
              f"{total_fetches/max(cost.sum(), 1):.2f}x); "
              f"{100*gsize[shared].sum()/total_fetches:.0f}% members in "
              f"shared groups; tile p50/p90 "
              f"{np.percentile(tile_cost, [50, 90])}")


if __name__ == "__main__":
    geo = build_geometry()
    analyze(*geo)
