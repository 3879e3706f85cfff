from enarf_gan_tpu.nn.layers import (
    EqualLinear,
    EqualConv1d,
    EqualConv2d,
    ModulatedConv1d,
    StyledConv1d,
    StyledMLP,
    MLP,
    pixel_norm,
    fused_leaky_relu,
)
from enarf_gan_tpu.nn.stylegan2 import (
    MappingNetwork,
    SynthesisNetwork,
    StyleGAN2Generator,
    Discriminator,
)
