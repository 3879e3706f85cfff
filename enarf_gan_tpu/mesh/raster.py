"""Minimal software mesh rasterizer (demo path).

Replaces the pytorch3d rasterizer + Phong shader used only for demo mesh
images (reference: libraries/NARF/mesh_rendering.py:17-47,
libraries/pytorch3d_utils.py). Z-buffered barycentric rasterization with
Lambertian shading from a headlight at the camera origin — numpy, no native
deps; not a hot path.
"""
from __future__ import annotations

import numpy as np


def render_mesh_image(verts: np.ndarray, faces: np.ndarray,
                      intrinsics: np.ndarray, img_size: int,
                      render_size: int = 512,
                      base_color=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Rasterize a camera-frame mesh to (render_size, render_size, 3) uint8."""
    if len(faces) == 0 or len(verts) == 0:
        return np.zeros((render_size, render_size, 3), np.uint8)
    scale = render_size / img_size
    K = intrinsics.copy().astype(np.float64)
    K[:2] *= scale

    v = verts.astype(np.float64)
    proj = (K @ v.T).T
    uv = proj[:, :2] / np.maximum(proj[:, 2:3], 1e-8)
    z = v[:, 2]

    tri_uv = uv[faces]          # (F, 3, 2)
    tri_z = z[faces]            # (F, 3)
    tri_v = v[faces]            # (F, 3, 3)

    # face normals + headlight Lambert term
    n = np.cross(tri_v[:, 1] - tri_v[:, 0], tri_v[:, 2] - tri_v[:, 0])
    n_norm = n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
    center = tri_v.mean(axis=1)
    light_dir = -center / (np.linalg.norm(center, axis=1, keepdims=True) + 1e-12)
    shade = np.abs((n_norm * light_dir).sum(axis=1))  # double-sided
    shade = 0.25 + 0.75 * shade

    depth = np.full((render_size, render_size), np.inf)
    img = np.zeros((render_size, render_size, 3), np.float64)
    color = np.asarray(base_color)

    order = np.argsort(-tri_z.mean(axis=1))  # far→near (z-buffer still decides)
    for f in order:
        p = tri_uv[f]
        x0, y0 = np.floor(p.min(axis=0)).astype(int)
        x1, y1 = np.ceil(p.max(axis=0)).astype(int) + 1
        x0, y0 = max(x0, 0), max(y0, 0)
        x1 = min(x1, render_size)
        y1 = min(y1, render_size)
        if x0 >= x1 or y0 >= y1 or (tri_z[f] <= 0).any():
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        d = np.stack([xs - p[0, 0], ys - p[0, 1]], axis=-1)
        e1 = p[1] - p[0]
        e2 = p[2] - p[0]
        det = e1[0] * e2[1] - e1[1] * e2[0]
        if abs(det) < 1e-12:
            continue
        w1 = (d[..., 0] * e2[1] - d[..., 1] * e2[0]) / det
        w2 = (e1[0] * d[..., 1] - e1[1] * d[..., 0]) / det
        w0 = 1 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        zi = w0 * tri_z[f, 0] + w1 * tri_z[f, 1] + w2 * tri_z[f, 2]
        sub_d = depth[y0:y1, x0:x1]
        closer = inside & (zi < sub_d)
        sub_d[closer] = zi[closer]
        img[y0:y1, x0:x1][closer] = color * shade[f]
    return np.clip(img * 255, 0, 255).astype(np.uint8)
