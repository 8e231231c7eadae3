from srgan_tpu.utils.image_io import array_to_image, load_image, save_image
from srgan_tpu.utils.logging import MetricsLogger, Throughput
from srgan_tpu.utils.plotting import (
    comparison_grid,
    save_comparison,
    save_rating_curve,
)

__all__ = [
    "array_to_image",
    "load_image",
    "save_image",
    "MetricsLogger",
    "Throughput",
    "comparison_grid",
    "save_comparison",
    "save_rating_curve",
]
