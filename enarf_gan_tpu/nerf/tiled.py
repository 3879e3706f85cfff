"""Patch-tiled volume rendering — the shared-fetch fast path's driver.

Differences from nerf/rendering.py (the reference-exact path,
rendering.py:82-224 semantics):

* rays are processed in P×P pixel patches (a static tile permutation of
  the image grid);
* the coarse depth range [dmin, dmax] is pooled over each patch's valid
  rays, so all member rays share one set of Nc bin depths (a superset of
  each ray's own clip range — same stratified estimator, slightly more
  masked samples);
* the fine pass importance-samples ONE depth set per patch from the
  patch-pooled (valid-ray mean) coarse transmittance weights instead of
  per-ray CDFs.

Both changes exist to bound the across-ray tri-plane window spread
(measured ≤5 texels at P=4, tools/analyze_patch_locality.py) so that
ops/tilewin.py can fetch one shared window per (patch, sample, bone,
plane). They change the sampling pattern, not the radiance field — the
renderer remains an unbiased stratified/importance estimator of the same
integral; parity with the exact path is asserted metric-level
(tests/test_tiled_render.py) rather than bitwise.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from enarf_gan_tpu.nerf.rendering import (RenderConfig, decide_frustum_range,
                                          _smooth_pad_weights,
                                          fine_sample_depths)
from enarf_gan_tpu.nerf.ray_sampler import image_grid_coords

# fn(points (B,3,n), ray_dir|None, pose_scaled, n_patch, m, S)
#   -> (density (B,1,n), color (B,3,n)|None); n == n_patch*m*S, and m may
#   be < P*P on the coarse pass (tile_coarse_corners)
TiledDensityColorFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]


def tile_permutation(size: int, P: int) -> np.ndarray:
    """perm[i] = raster ray index of the i-th ray in patch-major order."""
    assert size % P == 0, (size, P)
    idx = np.arange(size * size).reshape(size, size)
    return idx.reshape(size // P, P, size // P, P) \
        .transpose(0, 2, 1, 3).reshape(-1)


def _pool_patch(v: jnp.ndarray, m: int, fn, neutral, valid) -> jnp.ndarray:
    """Reduce (B, np*m) member values → (B, np) over valid members."""
    B, n = v.shape
    vv = jnp.where(valid, v, neutral).reshape(B, n // m, m)
    return fn(vv, axis=2)


def render_rays_tiled(rng: jax.Array, fn: TiledDensityColorFn,
                      image_coord: jnp.ndarray, pose_to_camera: jnp.ndarray,
                      inv_intrinsics: jnp.ndarray, cfg: RenderConfig, P: int,
                      camera_pose: Optional[jnp.ndarray] = None,
                      pose_prescaled: bool = False,
                      frustum=None, with_aux: bool = True,
                      ray_chunk: Optional[int] = None):
    """Render rays already in patch-major order (m = P*P members/patch).

    Returns (color (B,3,n), mask (B,n), disparity (B,n), aux) like
    nerf/rendering.py::render_rays. ``ray_chunk`` scans fixed-size chunks
    of whole patches inside the graph — identical results, and the
    DIFFERENTIABLE peak memory scales with the chunk (the scan's backward
    replays one chunk at a time), exactly like render_rays' ray_chunk.
    """
    B, _, _, n = image_coord.shape
    m = P * P
    n_patch = n // m
    assert n_patch * m == n, (n, P)
    if ray_chunk is not None and n > ray_chunk:
        assert frustum is None, "precomputed frustum + ray_chunk unsupported"
        chunk = ray_chunk - ray_chunk % m
        assert chunk > 0 and n % chunk == 0, (n, ray_chunk, m)
        n_chunks = n // chunk
        if cfg.coordinate_scale != 1 and not pose_prescaled:
            pose_to_camera = pose_to_camera.at[:, :, :3, 3] \
                .multiply(cfg.coordinate_scale)
        coords = image_coord.reshape(B, 1, 3, n_chunks, chunk) \
            .transpose(3, 0, 1, 2, 4)
        keys = jax.random.split(rng, n_chunks)

        def body(carry, inp):
            key, coord = inp
            return carry, render_rays_tiled(
                key, fn, coord, pose_to_camera, inv_intrinsics, cfg, P,
                camera_pose=camera_pose, pose_prescaled=True,
                with_aux=with_aux)

        _, (color, mask, disp, aux) = lax.scan(body, None, (keys, coords))
        color = color.transpose(1, 2, 0, 3).reshape(B, 3, n)
        mask = mask.transpose(1, 0, 2).reshape(B, n)
        disp = disp.transpose(1, 0, 2).reshape(B, n)

        def merge(name, x):
            if name == "fine_points":        # (C, B, 3, chunk*Nf) ray-major
                return x.transpose(1, 2, 0, 3).reshape(B, 3, -1)
            # (C, B, 1, chunk, S) → (B, 1, n, S)
            return x.transpose(1, 2, 0, 3, 4).reshape(
                B, x.shape[2], n, x.shape[4])

        aux = {k: merge(k, v) for k, v in aux.items()}
        return color, mask, disp, aux
    Nc, Nf = cfg.Nc, cfg.Nf
    if cfg.coordinate_scale != 1 and not pose_prescaled:
        pose_to_camera = pose_to_camera.at[:, :, :3, 3] \
            .multiply(cfg.coordinate_scale)

    if frustum is None:
        frustum = decide_frustum_range(image_coord, pose_to_camera,
                                       inv_intrinsics, cfg.near_plane,
                                       cfg.far_plane)
    dmin, dmax, ray_direction, validity = frustum   # (B,1,1,n) / (B,3,n)

    # patch-pooled depth range over valid member rays
    val = validity.reshape(B, n)
    big = jnp.float32(1e9)
    dmin_p = _pool_patch(dmin.reshape(B, n), m, jnp.min, big, val)
    dmax_p = _pool_patch(dmax.reshape(B, n), m, jnp.max, -big, val)
    any_valid = (dmin_p < big)
    dmin_p = jnp.where(any_valid, dmin_p, cfg.near_plane)  # (B, np)
    dmax_p = jnp.where(any_valid, dmax_p, cfg.far_plane)

    if cfg.view_dependent:
        assert camera_pose is not None
        rd = ray_direction / jnp.linalg.norm(ray_direction, axis=1,
                                             keepdims=True)
        rot = camera_pose[:, :3, :3] if camera_pose.shape[-1] == 4 \
            else camera_pose
        ray_dir_world = jnp.einsum("bij,bjn->bin",
                                   jnp.swapaxes(rot, -1, -2), rd)
    else:
        ray_dir_world = None

    # ---- coarse pass: Nc patch-common bin midpoints ----
    bins = jnp.linspace(0.0, 1.0, Nc + 1).reshape(1, 1, Nc + 1)
    cd = dmin_p[:, :, None] * (1 - bins) + dmax_p[:, :, None] * bins
    cd_mid = (cd[..., 1:] + cd[..., :-1]) / 2               # (B, np, Nc)
    rd3 = ray_direction.reshape(B, 3, n_patch, m)
    if cfg.tile_coarse_corners and P >= 3:
        # coarse density only steers the patch-pooled importance weights;
        # the patch's 4 corner rays bound the same texel windows and pool
        # to nearly the same weights at ~4x less coarse work
        m_idx = np.array([0, P - 1, (P - 1) * P, P * P - 1])
        rd3c = rd3[:, :, :, m_idx]
        valc = val.reshape(B, n_patch, m)[:, :, m_idx]
        mc = len(m_idx)
    else:
        rd3c, valc, mc = rd3, val.reshape(B, n_patch, m), m
    pts_c = rd3c[..., None] * cd_mid[:, None, :, None, :]   # (B,3,np,mc,Nc)
    coarse_density, _ = fn(lax.stop_gradient(pts_c.reshape(B, 3, -1)),
                           None, pose_to_camera, n_patch, mc, Nc)
    coarse_density = lax.stop_gradient(coarse_density)

    # per-ray transmittance weights at the common bins, pooled per patch
    dens = coarse_density.reshape(B, 1, n_patch, mc, Nc)
    delta = (cd[..., 1:] - cd[..., :-1])[:, None, :, None, :]
    dd = dens * delta * cfg.render_scale
    T_i = jnp.exp(-(jnp.cumsum(dd, axis=4) - dd))
    w_ray = T_i * (1 - jnp.exp(-dd))                        # (B,1,np,mc,Nc)
    vmem = valc[:, None, :, :, None]
    w_sum = (w_ray * vmem).sum(axis=3)
    w_cnt = jnp.maximum(vmem.sum(axis=3), 1.0)
    w_patch = (w_sum / w_cnt).reshape(B * n_patch, Nc)
    w_patch = _smooth_pad_weights(w_patch)

    # ---- fine pass: Nf patch-common importance depths ----
    fb = fine_sample_depths(rng, w_patch, Nf, Nc).reshape(B, n_patch, Nf)
    fd = dmin_p[:, :, None] * (1 - fb) + dmax_p[:, :, None] * fb  # (B,np,Nf)
    pts_f = rd3[..., None] * fd[:, None, :, None, :]        # (B,3,np,m,Nf)
    fine_density, fine_color = fn(pts_f.reshape(B, 3, -1), ray_dir_world,
                                  pose_to_camera, n_patch, m, Nf)

    # ---- composite (same math as render_rays, rendering.py:273-293) ----
    fine_depth = jnp.broadcast_to(fd[:, None, :, None, :],
                                  (B, 1, n_patch, m, Nf)).reshape(B, 1, n, Nf)
    fine_color = fine_color.reshape(B, 3, n, Nf)[..., :Nf - 1]
    fine_density = fine_density.reshape(B, 1, n, Nf)[..., :Nf - 1]
    delta_f = fine_depth[..., 1:] - fine_depth[..., :-1]
    dd = fine_density * delta_f * cfg.render_scale
    T_i = jnp.exp(-(jnp.cumsum(dd, axis=3) - dd))
    weights = T_i * (1 - jnp.exp(-dd))
    depth_mid = fine_depth[..., :-1]
    color = jnp.sum(weights * fine_color, axis=3)
    mask = jnp.sum(weights, axis=3).reshape(B, n)
    disparity = jnp.sum(weights / depth_mid, axis=3).reshape(B, n)

    valid1 = validity.reshape(B, 1, n)
    color = jnp.where(valid1, color, 0.0)
    mask = jnp.where(valid1[:, 0], mask, 0.0)
    disparity = jnp.where(valid1[:, 0], disparity, 0.0)
    aux = {}
    if with_aux:
        aux = {"fine_weights": weights, "fine_depth": fine_depth,
               "fine_density": fine_density,
               "fine_points": pts_f.reshape(B, 3, -1)}
    return color, mask, disparity, aux


def render_entire_img_tiled(rng: jax.Array, fn: TiledDensityColorFn,
                            pose_to_camera: jnp.ndarray,
                            inv_intrinsics: jnp.ndarray, cfg: RenderConfig,
                            render_size: int, P: int,
                            ray_batchsize: int = 16384,
                            camera_pose: Optional[jnp.ndarray] = None):
    """Full-image render scanning patch-major ray chunks inside jit.

    Tiled analog of rendering.py::render_entire_img (batch size 1).
    Returns (color (3,H,W), mask (H,W), disparity (H,W)).
    """
    size = render_size
    m = P * P
    perm = jnp.asarray(tile_permutation(size, P))
    _, img_coord = image_grid_coords(size, size, 1)
    img_coord = img_coord[..., perm]                  # patch-major rays
    n = size * size
    n_patch_total = n // m
    pose_to_camera = pose_to_camera[:1]               # batch-1 renderer
    inv_intrinsics = inv_intrinsics[:1] if inv_intrinsics.ndim == 3 \
        else inv_intrinsics
    if camera_pose is not None:
        camera_pose = camera_pose[:1]

    if cfg.coordinate_scale != 1:
        pose_to_camera = pose_to_camera.at[:, :, :3, 3] \
            .multiply(cfg.coordinate_scale)

    chunk = max(min(ray_batchsize, n) // m, 1) * m
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n                        # whole-patch padding

    # Frame-level frustum probe once + PATCH-level compaction: process
    # patches with any valid ray first and lax.cond-skip all-invalid
    # chunks (the tiled analog of render_entire_img's valid-first ray
    # ordering, rendering.py:331-391 — real frames are mostly background)
    frustum = decide_frustum_range(img_coord, pose_to_camera, inv_intrinsics,
                                   cfg.near_plane, cfg.far_plane)
    patch_valid = frustum[3].reshape(n_patch_total, m).any(axis=1)
    p_order = jnp.argsort(jnp.logical_not(patch_valid), stable=True)
    ray_order = (p_order[:, None] * m
                 + jnp.arange(m, dtype=p_order.dtype)).reshape(-1)
    inv_order = jnp.argsort(ray_order)

    def permute(x, axis):
        """Valid-first patch order + zero-pad to whole chunks (padded rays
        have validity False, so their chunks are cond-skipped)."""
        x = jnp.take(x, ray_order, axis=axis)
        if pad:
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, pad)
            x = jnp.pad(x, widths)
        return x

    coords_s = permute(img_coord, 3) \
        .reshape(1, 1, 3, n_chunks, chunk).transpose(3, 0, 1, 2, 4)
    fr_chunks = (
        permute(frustum[0], 3).reshape(1, 1, 1, n_chunks, chunk)
        .transpose(3, 0, 1, 2, 4),
        permute(frustum[1], 3).reshape(1, 1, 1, n_chunks, chunk)
        .transpose(3, 0, 1, 2, 4),
        permute(frustum[2], 2).reshape(1, 3, n_chunks, chunk)
        .transpose(2, 0, 1, 3),
        permute(frustum[3], 3).reshape(1, 1, 1, n_chunks, chunk)
        .transpose(3, 0, 1, 2, 4),
    )
    has_valid = fr_chunks[3].reshape(n_chunks, -1).any(axis=1)
    keys = jax.random.split(rng, n_chunks)

    def body(carry, inp):
        key, coord, fr0, fr1, fr2, fr3, hv = inp

        def do_render(_):
            color, mask, disp, _ = render_rays_tiled(
                key, fn, coord, pose_to_camera, inv_intrinsics, cfg, P,
                camera_pose=camera_pose, pose_prescaled=True,
                frustum=(fr0, fr1, fr2, fr3), with_aux=False)
            return color, mask, disp

        def skip(_):
            return (jnp.zeros((1, 3, chunk), jnp.float32),
                    jnp.zeros((1, chunk), jnp.float32),
                    jnp.zeros((1, chunk), jnp.float32))

        return carry, lax.cond(hv, do_render, skip, None)

    _, (color, mask, disp) = lax.scan(
        body, None, (keys, coords_s) + fr_chunks + (has_valid,))
    color = color.transpose(1, 2, 0, 3).reshape(3, -1)[:, :n]
    mask = mask.transpose(1, 0, 2).reshape(-1)[:n]
    disp = disp.transpose(1, 0, 2).reshape(-1)[:n]

    # undo patch-validity ordering, then the tile permutation
    inv = jnp.take(inv_order, jnp.argsort(perm))
    return (color[:, inv].reshape(3, size, size),
            mask[inv].reshape(size, size),
            disp[inv].reshape(size, size))
