from .mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    replicated,
    shard_batch,
)
from .sharding import fsdp_shardings, fsdp_spec, place_params

__all__ = [
    "DATA_AXIS", "FSDP_AXIS", "batch_sharding", "fsdp_shardings", "fsdp_spec",
    "make_mesh", "pad_batch_to_devices", "place_params", "replicate",
    "replicated", "shard_batch",
]
