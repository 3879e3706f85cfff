from enarf_gan_tpu.ops.grid_sample import grid_sample_2d
from enarf_gan_tpu.ops.activation import density_relu, straight_through_clamp
from enarf_gan_tpu.ops.triplane import (
    sample_feature,
    sample_triplane_part_prob,
    sample_weighted_feature,
)
from enarf_gan_tpu.ops.upfirdn import upfirdn2d, make_blur_kernel
