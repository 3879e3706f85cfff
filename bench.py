"""Volume-render throughput benchmark (runs on the real TPU chip).

Workload: DSO-demo-style full-image render of a 24-joint articulated
tri-plane NARF at reference scale — Nc=48 coarse + Nf=64 fine samples per ray,
256² tri-planes, 23 bone frames (configs/DSO_train/NeuralActor/lan_denarf.yml,
DSO_demo.py:23). Reports Mrays/sec on one chip.

By default BOTH sampler formulations are timed and the faster one is
reported (the hardware picks the winner):
  * tilewin patch-window shared fetches (ops/tilewin.py, tile_patch=4)
  * exact per-member unirow fused rows (ops/unirow.py)
Force one with BENCH_TILED=4 / BENCH_TILED=0.

Prints ONE JSON line:
    {"metric": "volume_render_mrays_per_sec", "value": N, "unit": "Mrays/s",
     "vs_baseline": N / 50.0, "variant": "tilewin4|exact", ...}
baseline = the 50 Mrays/s/chip north-star from BASELINE.json (the reference
publishes no throughput numbers — SURVEY.md §6).
"""
import json
import os
import sys
import time

import numpy as np


def _build(tile_patch, render_size, ray_chunk, Nc, Nf):
    import jax
    import jax.numpy as jnp
    from enarf_gan_tpu.models.narf import NARFParams
    from enarf_gan_tpu.models.generator import (DSONARFGenerator,
                                                register_canonical_pose,
                                                make_dso_full_renderer)
    from enarf_gan_tpu.geometry.smpl import SMPL_PARENTS
    from __graft_entry__ import _tiny_scene

    params = NARFParams(Nc=Nc, Nf=Nf, hidden_size=256, tri_plane_size=256,
                        render_bs=ray_chunk, coordinate_scale=3.0,
                        view_dependent=False, origin_location="center_fixed",
                        deformation_field=True, time_conditional=True,
                        pose_conditional=False,
                        plane_sample_dtype=os.environ.get(
                            "BENCH_PLANE_DTYPE", "bfloat16"),
                        tile_patch=tile_patch,
                        tile_coarse_corners=(tile_patch > 0 and os.environ.get(
                            "BENCH_COARSE_CORNERS", "1") == "1"))
    gen = DSONARFGenerator(nerf_params=params, size=render_size, num_bone=24,
                           parent_id=tuple(int(x) for x in SMPL_PARENTS),
                           use_triplane=True, ray_batchsize=4096)

    # BENCH_FOCAL_SCALE=0.35 gives a ZJU-like sparse frame (fg 10-20% of
    # pixels — tests/test_tilewin_sparse.py geometry); default 1.2 is the
    # dense bench scene (~87% of rays valid)
    pose_cam, world, bl, inv_K, canonical, K = _tiny_scene(
        1, render_size,
        focal_scale=float(os.environ.get("BENCH_FOCAL_SCALE", 1.2)))
    rng = jax.random.PRNGKey(0)
    ft = jnp.array([0.5], jnp.float32)
    variables = gen.init(rng, rng, jnp.asarray(pose_cam),
                         jnp.asarray(world[:, 0, :3, :3]),
                         jnp.ones((1, render_size, render_size)), ft,
                         jnp.asarray(bl), jnp.asarray(inv_K))
    variables = register_canonical_pose(variables, canonical, "center_fixed",
                                        np.asarray(SMPL_PARENTS))
    renderer = make_dso_full_renderer(gen, render_size,
                                      ray_batchsize=ray_chunk,
                                      with_camera_pose=False)
    args = (variables, jnp.asarray(pose_cam), jnp.asarray(inv_K), ft,
            jnp.asarray(bl))
    return renderer, args


def _time_variant(tile_patch, render_size, ray_chunk, Nc, Nf, reps):
    """(s/frame, compile_s) for one sampler formulation; hard host-fetch
    sync — block_until_ready does not reliably fence on remote runtimes.
    The render is scalar-reduced ON DEVICE (color+mask+disparity checksum)
    so the sync fetches 4 bytes, not the ~800 KB frame over the tunnel."""
    import jax
    import jax.numpy as jnp
    renderer, (variables, pose_cam, inv_K, ft, bl) = _build(
        tile_patch, render_size, ray_chunk, Nc, Nf)

    @jax.jit
    def render_scalar(v, key, pc, ik, t, b):
        out = renderer(v, key, pc, ik, t, b)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree_util.tree_leaves(out))

    def render_once(seed):
        return float(np.asarray(render_scalar(
            variables, jax.random.PRNGKey(seed), pose_cam, inv_K, ft, bl)))

    t_compile = time.perf_counter()
    chk = render_once(0)
    compile_s = time.perf_counter() - t_compile
    assert np.isfinite(chk), chk
    name = f"tilewin{tile_patch}" if tile_patch else "exact"
    print(f"# {name}: compile+first render {compile_s:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(reps):
        render_once(i + 1)
    dt = (time.perf_counter() - t0) / reps
    print(f"# {name}: {dt * 1e3:.1f} ms/frame", file=sys.stderr)
    return dt, compile_s


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()

    render_size = int(os.environ.get("BENCH_RENDER_SIZE", 128))
    ray_chunk = int(os.environ.get("BENCH_RAY_CHUNK", 4096))
    Nc = int(os.environ.get("BENCH_NC", 48))
    Nf = int(os.environ.get("BENCH_NF", 64))
    reps = int(os.environ.get("BENCH_REPS", 5))

    forced = os.environ.get("BENCH_TILED")
    variants = [int(forced)] if forced is not None else [4, 0]
    results = {}
    for tp in variants:
        try:
            results[tp] = _time_variant(tp, render_size, ray_chunk, Nc, Nf,
                                        reps)
        except Exception as e:  # one variant failing must not kill the bench
            print(f"# variant tile_patch={tp} failed: {e!r}", file=sys.stderr)
    assert results, "no bench variant ran"
    best_tp = min(results, key=lambda tp: results[tp][0])
    dt, compile_s = results[best_tp]

    n_rays = render_size * render_size
    mrays = n_rays / dt / 1e6
    baseline = 50.0  # Mrays/s/chip north star (BASELINE.json)
    print(json.dumps({"metric": "volume_render_mrays_per_sec",
                      "value": round(mrays, 6), "unit": "Mrays/s",
                      "vs_baseline": round(mrays / baseline, 6),
                      "variant": f"tilewin{best_tp}" if best_tp else "exact",
                      "all_ms_per_frame": {
                          (f"tilewin{tp}" if tp else "exact"):
                              round(v[0] * 1e3, 2)
                          for tp, v in results.items()}}))


if __name__ == "__main__":
    main()
