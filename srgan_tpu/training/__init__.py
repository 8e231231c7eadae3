from srgan_tpu.training.checkpoint import (
    FINETUNE_PREFIX,
    finetune_entry,
    restore_checkpoint,
    save_checkpoint,
)
from srgan_tpu.training.loop import Trainer, train
from srgan_tpu.training.pool import (
    GeneratorPool,
    PoolMember,
    interpolate_params,
    sort_lists_in_same_order,
)
from srgan_tpu.training.steps import (
    discriminator_step,
    discriminator_step_on_sr,
    eval_step,
    generator_gan_step,
    generator_pixel_step,
    infer_step,
)
from srgan_tpu.training.train_state import TrainState, cosine_lr, epoch_lr, linear_lr

__all__ = [
    "FINETUNE_PREFIX",
    "finetune_entry",
    "restore_checkpoint",
    "save_checkpoint",
    "Trainer",
    "train",
    "GeneratorPool",
    "PoolMember",
    "interpolate_params",
    "sort_lists_in_same_order",
    "discriminator_step",
    "discriminator_step_on_sr",
    "eval_step",
    "generator_gan_step",
    "generator_pixel_step",
    "infer_step",
    "TrainState",
    "cosine_lr",
    "epoch_lr",
    "linear_lr",
]
