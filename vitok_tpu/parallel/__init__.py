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


def __getattr__(name):
    # Pipeline exports are lazy: pipeline.py pulls in model internals, which
    # would make every `from vitok_tpu.parallel import create_mesh` pay the
    # model-module import.
    if name in (
        "PIPE_AXIS",
        "make_pipeline_train_step",
        "pipeline_param_specs",
        "pipeline_parallel_decode",
        "pipeline_parallel_value_and_grad",
    ):
        from vitok_tpu.parallel import pipeline

        return getattr(pipeline, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


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
    "PIPE_AXIS",
    "make_pipeline_train_step",
    "pipeline_param_specs",
    "pipeline_parallel_decode",
    "pipeline_parallel_value_and_grad",
]
