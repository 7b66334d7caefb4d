"""Device mesh + sharding utilities (the distributed backend)."""

from .inference import view_sharded_forward
from .mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_sharding",
    "shard_batch",
    "shard_params",
    "view_sharded_forward",
]
