from srgan_tpu.data.dataset import (
    ImageFolderDataset,
    PairedImageDataset,
    list_image_files,
    load_hr_clip,
    load_image_rgb,
    split_indices,
)
from srgan_tpu.data.pipeline import EpochSampler, HostBatcher, TrainPipeline

__all__ = [
    "ImageFolderDataset",
    "PairedImageDataset",
    "list_image_files",
    "load_hr_clip",
    "load_image_rgb",
    "split_indices",
    "EpochSampler",
    "HostBatcher",
    "TrainPipeline",
]
