"""Time the bench renderer's internal pieces on the real TPU (scalar-out)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    from enarf_gan_tpu.models.narf import NARFParams
    from enarf_gan_tpu.models.generator import (DSONARFGenerator,
                                                register_canonical_pose)
    from enarf_gan_tpu.nerf.rendering import render_rays, RenderConfig
    from enarf_gan_tpu.geometry.smpl import SMPL_PARENTS
    from __graft_entry__ import _tiny_scene

    BASE = [None]

    def timed(fn, *args, iters=3):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t = (time.perf_counter() - t0) / iters
        return max(t - (BASE[0] or 0), 1e-9)

    @jax.jit
    def null(x):
        return x.sum()

    BASE[0] = timed(null, jnp.ones((8, 128)), iters=5)
    print(f"baseline {BASE[0]*1e3:.1f} ms", flush=True)

    render_size, ray_chunk = 128, 4096
    params = NARFParams(Nc=48, Nf=64, hidden_size=256, tri_plane_size=256,
                        render_bs=ray_chunk, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=True, time_conditional=True,
                        pose_conditional=False,
                        plane_sample_dtype="bfloat16")
    gen = DSONARFGenerator(nerf_params=params, size=render_size, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=4096)
    pose_cam, world, bl, inv_K, canonical, K = _tiny_scene(1, render_size)
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]),
                         jnp.ones((1, render_size, render_size)), ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))

    pose_cam = jnp.asarray(pose_cam)
    inv_K = jnp.asarray(inv_K)
    bl = jnp.asarray(bl)

    # latents + transform_pose
    @jax.jit
    def t_latents(v, ft, pc, bl):
        z = gen.apply(v, ft, pc, method="get_latents")
        pose_t, bl_t = gen.apply(v, pc, bl, method="transform_pose")
        return z.sum() + pose_t.sum() + bl_t.sum()

    print(f"latents+transform: {timed(t_latents, variables, ft, pose_cam, bl)*1e3:8.2f} ms",
          flush=True)

    @jax.jit
    def mk_cond(v, ft, pc, bl):
        z = gen.apply(v, ft, pc, method="get_latents")
        pose_t, bl_t = gen.apply(v, pc, bl, method="transform_pose")
        cond = gen.apply(v, z, bl_t, method="compute_tri_plane_feature")
        return cond, z, pose_t, bl_t

    @jax.jit
    def t_cond(v, ft, pc, bl):
        cond, _, _, _ = mk_cond(v, ft, pc, bl)
        return cond.sum()

    print(f"tri-plane gen (deformation warp): {timed(t_cond, variables, ft, pose_cam, bl)*1e3:8.2f} ms",
          flush=True)

    cond, z, pose_t, bl_t = mk_cond(variables, ft, pose_cam, bl)

    @jax.jit
    def t_pack(v, cond):
        pk = gen.apply(v, cond, method="pack_planes")
        return sum(x.sum() for x in jax.tree_util.tree_leaves(pk))

    print(f"pack_planes (quad): {timed(t_pack, variables, cond)*1e3:8.2f} ms",
          flush=True)

    packed = jax.jit(lambda v, c: gen.apply(v, c, method="pack_planes"))(
        variables, cond)

    # one chunk of rays through render_rays (coarse+fine)
    idx = np.arange(ray_chunk)
    xs = (idx % render_size + 0.5).astype(np.float32)
    ys = (idx // render_size + 40.5).astype(np.float32)
    coords = jnp.asarray(np.stack([xs, ys, np.ones_like(xs)], 0)) \
        .reshape(1, 1, 3, ray_chunk)
    cfg = gen.render_cfg()

    @jax.jit
    def t_chunk(v, packed, z, pose_t, bl_t, coords):
        def fn(points, ray_dir, pose_scaled):
            return gen.apply(v, points, pose_scaled, bl_t, packed, z, ray_dir,
                             method="nerf_density_color")
        color, mask, disp, _ = render_rays(jax.random.PRNGKey(1), fn, coords,
                                           pose_t, inv_K, cfg)
        return color.sum() + mask.sum() + disp.sum()

    print(f"render_rays 1 chunk (4096 rays, packed): "
          f"{timed(t_chunk, variables, packed, z, pose_t, bl_t, coords)*1e3:8.2f} ms",
          flush=True)

    # density_color alone at coarse volume
    pts = jax.random.uniform(rng, (1, 3, ray_chunk * 48), jnp.float32, -1, 1)

    @jax.jit
    def t_dc(v, packed, z, pose_t, bl_t, pts):
        p2 = pose_t.at[:, :, :3, 3].multiply(cfg.coordinate_scale)
        d, c = gen.apply(v, pts, p2, bl_t, packed, z, None,
                         method="nerf_density_color")
        return d.sum() + (0 if c is None else c.sum())

    print(f"density_color coarse chunk (196K pts): "
          f"{timed(t_dc, variables, packed, z, pose_t, bl_t, pts)*1e3:8.2f} ms",
          flush=True)

    # full renderer for reference
    from enarf_gan_tpu.models.generator import make_dso_full_renderer
    renderer = make_dso_full_renderer(gen, render_size, ray_batchsize=ray_chunk,
                                      with_camera_pose=False)

    def t_full(v):
        out = renderer(v, jax.random.PRNGKey(2), pose_cam, inv_K, ft, bl)
        return out

    print(f"full frame (16384 rays): {timed(t_full, variables)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
