from enarf_gan_tpu.training.losses import (
    adv_loss_dis,
    adv_loss_gen,
    r1_penalty,
    nerf_patch_loss,
    photometric_loss,
)
from enarf_gan_tpu.training.checkpoint import save_checkpoint, load_checkpoint
