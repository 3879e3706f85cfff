from enarf_gan_tpu.geometry.encoding import (
    positional_encoding,
    multi_part_positional_encoding,
    in_cube,
    to_local,
)
from enarf_gan_tpu.geometry.pose import (
    transform_pose,
    rotation_matrix,
    rotate_pose,
    rotate_pose_by_angle,
    interpolate_pose,
)
from enarf_gan_tpu.geometry.smpl import (
    rodrigues,
    rigid_transform,
    smpl_pose_transforms,
    move_to_origin,
    axis_transformation,
    SMPL_PARENTS,
)
