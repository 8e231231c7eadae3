from srgan_tpu.models.discriminator import Discriminator, init_discriminator
from srgan_tpu.models.enhancer import enhance
from srgan_tpu.models.srresnet import ResidualBlock, SRResNet, init_generator
from srgan_tpu.models.vgg import (
    VGG19Features,
    init_vgg_extractor,
    perceptual_loss,
)

__all__ = [
    "Discriminator",
    "init_discriminator",
    "enhance",
    "ResidualBlock",
    "SRResNet",
    "init_generator",
    "VGG19Features",
    "init_vgg_extractor",
    "perceptual_loss",
]
