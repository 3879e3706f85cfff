from enarf_gan_tpu.utils.logging import (
    MetricsWriter,
    save_img_grid,
    record_command,
    JsonLog,
)
