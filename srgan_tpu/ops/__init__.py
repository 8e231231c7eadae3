from srgan_tpu.ops.filters import depthwise_conv3x3, sharpen, sobel_edge_map
from srgan_tpu.ops.gan_loss import (
    discriminator_loss,
    generator_adversarial_loss,
    uniformity_loss,
)
from srgan_tpu.ops.metrics import batched_psnr_ssim, psnr, ssim
from srgan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from srgan_tpu.ops.recon_loss import (
    edge_importance_map,
    reconstruction_loss,
    reconstruction_loss_with_edges,
)
from srgan_tpu.ops.resize import (
    add_gaussian_noise,
    add_salt_pepper,
    degrade_batch,
    resize_bicubic,
    resize_bilinear,
)

__all__ = [
    "depthwise_conv3x3",
    "sharpen",
    "sobel_edge_map",
    "discriminator_loss",
    "generator_adversarial_loss",
    "uniformity_loss",
    "batched_psnr_ssim",
    "psnr",
    "ssim",
    "pixel_shuffle",
    "pixel_unshuffle",
    "edge_importance_map",
    "reconstruction_loss",
    "add_gaussian_noise",
    "add_salt_pepper",
    "degrade_batch",
    "resize_bicubic",
    "resize_bilinear",
]
