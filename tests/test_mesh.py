import numpy as np
import jax.numpy as jnp

from enarf_gan_tpu.mesh.extract import (marching_tetrahedra, extract_mesh)
from enarf_gan_tpu.mesh.raster import render_mesh_image


def sphere_volume(D=24, radius=0.35):
    bins = np.linspace(-1, 1, D)
    x, y, z = np.meshgrid(bins, bins, bins, indexing="ij")
    return (radius ** 2 - (x ** 2 + y ** 2 + z ** 2)).astype(np.float32), bins


def test_marching_tetrahedra_sphere():
    vol, bins = sphere_volume()
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) > 50 and len(faces) > 50
    # vertices lie near the iso-sphere of radius 0.35 (in index coords)
    spacing = bins[1] - bins[0]
    world = verts * spacing - 1.0
    r = np.linalg.norm(world, axis=1)
    assert abs(np.median(r) - 0.35) < 0.05
    # faces index valid vertices
    assert faces.max() < len(verts)


def test_marching_tetrahedra_empty():
    vol = np.zeros((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_extract_mesh_from_density_fn():
    center = np.array([0.0, 0.0, 3.0], np.float32)

    def density_fn(points):  # sphere of radius 0.3 around center (scaled x1)
        d = 100.0 * ((jnp.linalg.norm(points - center.reshape(1, 3, 1),
                                      axis=1, keepdims=True) < 0.3))
        return d

    verts, faces = extract_mesh(density_fn, center, voxel_size=0.05,
                                mesh_th=15.0, coordinate_scale=1.0,
                                cube_half=12, chunk=4096)
    assert len(verts) > 0
    r = np.linalg.norm(verts - center, axis=1)
    assert abs(np.median(r) - 0.3) < 0.06


def test_rasterizer_renders_triangle():
    K = np.array([[100, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
    verts = np.array([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.3, 2.0]],
                     np.float32)
    faces = np.array([[0, 1, 2]])
    img = render_mesh_image(verts, faces, K, img_size=64, render_size=64)
    assert img.shape == (64, 64, 3)
    assert img.max() > 50  # something was drawn
    assert img[0, 0].sum() == 0  # corner empty
