from srgan_tpu.parallel.spatial import upscale_spatially_sharded
from srgan_tpu.parallel.mesh import (
    batch_sharding,
    initialize_multihost,
    make_mesh,
    process_shard_info,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "initialize_multihost",
    "make_mesh",
    "process_shard_info",
    "replicate",
    "replicated",
    "shard_batch",
    "upscale_spatially_sharded",
]
