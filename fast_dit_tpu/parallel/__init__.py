"""Mesh parallelism: GSPMD dp/fsdp/tp in place of the reference's DDP/NCCL."""

from .mesh import (
    batch_sharding,
    create_mesh,
    dit_param_spec,
    param_shardings,
    replicated_sharding,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "dit_param_spec",
    "param_shardings",
    "replicated_sharding",
    "shard_params",
]
