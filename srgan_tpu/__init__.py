"""srgan_tpu — a TPU-native multi-generator super-resolution GAN framework.

From-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``angelowxx/Super_resolution-Image-Reconstructer-Multi_Generator_GAN``
(see SURVEY.md at the repo root for the component-by-component mapping).
"""

from srgan_tpu.config import (
    Config,
    DataConfig,
    DiscriminatorConfig,
    MeshConfig,
    ModelConfig,
    PoolConfig,
    TrainConfig,
    small_test_config,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "DataConfig",
    "DiscriminatorConfig",
    "MeshConfig",
    "ModelConfig",
    "PoolConfig",
    "TrainConfig",
    "small_test_config",
]
