from enarf_gan_tpu.eval_lib.metrics import psnr, ssim, mse
from enarf_gan_tpu.eval_lib.fid import (
    frechet_distance,
    compute_statistics,
    FeatureExtractor,
)
