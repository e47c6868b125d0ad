"""Parallelism: device meshes, sharding rules, distributed reductions."""

from vitok_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    MODEL_AXIS,
    create_mesh,
    initialize_distributed,
)
from vitok_tpu.parallel.sharding import (
    ae_param_specs,
    batch_specs,
    param_shardings,
    place_on_mesh,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "FSDP_AXIS",
    "MODEL_AXIS",
    "create_mesh",
    "initialize_distributed",
    "ae_param_specs",
    "batch_specs",
    "param_shardings",
    "place_on_mesh",
    "replicated",
    "shard_batch",
    "shard_params",
]
