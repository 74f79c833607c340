"""Device-mesh parallelism helpers (data-parallel over ICI)."""

from .mesh import (
    make_mesh,
    init_multihost,
    local_batch_slice,
    shard_batch,
    replicate,
    make_parallel_train_step,
    device_put_batch,
)

__all__ = [
    "make_mesh",
    "init_multihost",
    "local_batch_slice",
    "shard_batch",
    "replicate",
    "make_parallel_train_step",
    "device_put_batch",
]
