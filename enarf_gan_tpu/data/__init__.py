from enarf_gan_tpu.data.mask2d import create_mask, pose_to_image_coord, SMPLProperty
from enarf_gan_tpu.data.datasets import (
    HumanDataset,
    HumanPoseDataset,
    SSODataset,
    SurrealPoseDepthDataset,
)
from enarf_gan_tpu.data.loader import DataLoader
from enarf_gan_tpu.data.fixtures import make_synthetic_human_cache
