from enarf_gan_tpu.nerf.ray_sampler import (
    whole_image_grid_ray_sampler,
    mask_based_sampler,
    image_grid_coords,
)
from enarf_gan_tpu.nerf.rendering import (
    decide_frustum_range,
    coarse_sample,
    fine_sample_depths,
    render_rays,
    render_entire_img,
    RenderConfig,
)
