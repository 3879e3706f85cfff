from enarf_gan_tpu.models.narf import NARFParams, TriPlaneNARF, MLPNARF
from enarf_gan_tpu.models.generator import (
    TriNARFGenerator,
    DSONARFGenerator,
    register_canonical_pose,
    dso_render_entire_img,
    gan_render_entire_img,
    make_dso_full_renderer,
    make_gan_full_renderer,
)
