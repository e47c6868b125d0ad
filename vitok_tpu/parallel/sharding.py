"""Sharding rules: PartitionSpecs for AE params and NaFlex batches.

The TPU-native replacement for the reference's DDP/FSDP2 wrappers
(``scripts/train_vae.py:164-174``): instead of wrapping modules, we annotate
the parameter pytree with ``NamedSharding``s over a ``(data, fsdp, model)``
mesh and let pjit/XLA insert the all-gathers and reduce-scatters over ICI.

* ``fsdp`` axis: every large kernel is sharded along one dimension —
  ZeRO-3-equivalent parameter sharding; XLA all-gathers weights per layer as
  the scan consumes them and reduce-scatters gradients.
* ``model`` axis: tensor parallel over attention heads / ffn hidden — the
  classic Megatron split (qkv & fc1 column-parallel, out & fc2 row-parallel),
  which the torch reference does not support at all (SURVEY.md §2.9).
* ``data`` axis: pure batch parallelism.

All rules are expressed per parameter-path and applied with
``tree_map_with_path``, so they work for any AE variant.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitok_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, MODEL_AXIS

Params = Dict[str, Any]


def _axis(mesh: Mesh, name: str) -> Optional[str]:
    """Return the axis name if present in the mesh with size > 1."""
    if name in mesh.axis_names and mesh.shape[name] > 1:
        return name
    return None


def ae_param_specs(mesh: Mesh) -> Any:
    """Map a param path to a PartitionSpec (callable for tree_map_with_path).

    Block kernels are stacked ``[depth, in, out]``; depth is never sharded
    (it is the scan axis). Column-parallel kernels (qkv, fc1) shard their
    output dim over ``model`` and input dim over ``fsdp``; row-parallel
    kernels (out, fc2) the reverse — so TP matmuls contract over the sharded
    axis and XLA inserts a single psum per block.
    """
    fsdp = _axis(mesh, FSDP_AXIS)
    tp = _axis(mesh, MODEL_AXIS)

    def spec_for(path, leaf=None) -> P:
        keys = [getattr(k, "key", str(k)) for k in path]
        ndim = getattr(leaf, "ndim", None)
        is_kernel = keys[-1] in ("kernel", "kernel_int8")
        if is_kernel and ndim == 3:
            # Stacked block kernels [depth, in, out].
            if "qkv" in keys or "fc1" in keys:
                return P(None, fsdp, tp)  # column-parallel
            if "out" in keys or "fc2" in keys:
                return P(None, tp, fsdp)  # row-parallel
            return P(None, fsdp, None)
        if is_kernel and ndim == 2:
            # Top-level embeds/heads [in, out]. These are tiny next to the
            # block stacks (decoder_embed on 5B is 0.004% of params), and
            # sharding their output dim forced the batch-sharded activation
            # cotangent to reshard onto fsdp in the backward — XLA's SPMD
            # partitioner fell back to "involuntary full rematerialization"
            # (replicate-then-slice) for patches-space grads. Shard only
            # when the kernel is actually big enough to matter.
            if fsdp is not None and leaf is not None and leaf.size >= (1 << 23):
                size = mesh.shape[fsdp]
                if leaf.shape[1] % size == 0:
                    return P(None, fsdp)
            return P()
        # norms / scales / biases / embeddings: replicated.
        return P()

    return spec_for


def _put_replicated_value(x, sharding: NamedSharding):
    """Place a host value (identical on every process) onto a sharding.

    Single-process this is a plain ``device_put``. Multi-process,
    ``device_put`` of a host-local value to a global sharding is not
    generally supported, so build the global array shard-by-shard from the
    host copy — every process holds the same full value (same seed init /
    same checkpoint), so slicing it locally is exact and transfer-free.
    """
    if jax.process_count() == 1 or getattr(x, "ndim", None) is None:
        return jax.device_put(x, sharding)
    host = np.asarray(x)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def shard_params(params: Params, mesh: Mesh, spec_fn=None) -> Params:
    """Place a param pytree onto the mesh according to ``ae_param_specs``
    (or a caller-supplied ``spec_fn(path, leaf) -> PartitionSpec``, e.g.
    ``pipeline_param_specs`` for pipe-staged decoder blocks).

    Works under multi-process (``jax.distributed``) runs: params are
    deterministic from the seed (or loaded from the same checkpoint) on
    every process, so each process materialises only its addressable
    shards of the global arrays.
    """
    if spec_fn is None:
        spec_fn = ae_param_specs(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: _put_replicated_value(
            x, NamedSharding(mesh, spec_fn(path, x))
        ),
        params,
    )


def param_shardings(params: Params, mesh: Mesh) -> Params:
    """Pytree of NamedShardings matching ``params`` (for jit in_shardings)."""
    spec_fn = ae_param_specs(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, spec_fn(path, x)), params
    )


def batch_specs(mesh: Mesh) -> P:
    """Batch axis sharded over data×fsdp (both are 'data parallel' for inputs).

    On a mesh with a ``pipe`` axis (pipeline training), batch rows shard
    over ``pipe`` as well — the encoder runs data-parallel across all
    devices (including the ones that stage the decoder), so a
    ``data=D,pipe=K`` mesh gives the encoder D*K-way batch parallelism.
    """
    axes = [a for a in (DATA_AXIS, FSDP_AXIS) if _axis(mesh, a)]
    if _axis(mesh, "pipe"):
        axes.append("pipe")
    return P(tuple(axes) if axes else None)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a NaFlex batch onto the mesh, batch-dim sharded.

    Multi-process (``jax.distributed``) semantics: the input is this
    process's LOCAL rows (the data loaders are rank-strided, reference
    ``vitok/utils.py:44-89`` analog), and the returned arrays are GLOBAL —
    batch axis = local rows × process_count — assembled with
    ``jax.make_array_from_process_local_data``. Single-process this is a
    plain sharded ``device_put``.
    """
    spec = batch_specs(mesh)
    sharding = NamedSharding(mesh, spec)

    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            if hasattr(v, "ndim") and v.ndim >= 1
            else v
            for k, v in batch.items()
        }
    return {
        k: jax.device_put(v, sharding) if hasattr(v, "ndim") and v.ndim >= 1 else v
        for k, v in batch.items()
    }


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def place_on_mesh(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf not already carrying a NamedSharding on ``mesh``.

    Makes mixed pytrees (sharded params + scalar step/optimizer counters)
    device-consistent for jit — required after a checkpoint restore, where
    scalars come back committed to a single device.
    """
    rep = replicated(mesh)

    def place(x):
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return x
        return _put_replicated_value(x, rep)

    return jax.tree_util.tree_map(place, tree)


__all__ = [
    "ae_param_specs",
    "shard_params",
    "param_shardings",
    "batch_specs",
    "shard_batch",
    "replicated",
]
