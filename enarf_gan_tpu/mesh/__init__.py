from enarf_gan_tpu.mesh.extract import (
    density_grid,
    marching_tetrahedra,
    extract_mesh,
)
from enarf_gan_tpu.mesh.raster import render_mesh_image
