"""Mesh parallelism: GSPMD dp/fsdp/tp in place of the reference's DDP/NCCL."""

from .mesh import (
    batch_sharding,
    create_expert_mesh,
    create_mesh,
    dit_param_spec,
    param_shardings,
    replicated_sharding,
    shard_params,
)
from .pipefusion import (init_kv_cache, pipefusion_forward,
                         pipefusion_sample_loop)
from .pipeline import create_pipeline_mesh, dit_pipeline_forward, pipeline_apply
from .sequence import (create_seq_mesh, dit_sequence_parallel_forward,
                       sequence_parallel_stack)

__all__ = [
    "batch_sharding",
    "create_expert_mesh",
    "create_mesh",
    "create_pipeline_mesh",
    "create_seq_mesh",
    "dit_sequence_parallel_forward",
    "sequence_parallel_stack",
    "dit_param_spec",
    "dit_pipeline_forward",
    "init_kv_cache",
    "param_shardings",
    "pipefusion_forward",
    "pipefusion_sample_loop",
    "pipeline_apply",
    "replicated_sharding",
    "shard_params",
]
