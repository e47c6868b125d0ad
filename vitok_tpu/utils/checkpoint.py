"""Sharded checkpoint/resume via Orbax + safetensors export.

The TPU-native replacement for the reference's torch DCP machinery
(``vitok/utils.py:22-41, 92-130`` in Na-VAE/vitok-release): Orbax writes
sharded arrays directly from device memory (each host writes its shards),
restores onto an arbitrary mesh, and keeps {params, opt_state, ema, step}
together. ``export_safetensors`` gathers to host and writes the released
split-artifact layout for torch interop. Unlike the reference's resume path
(broken, SURVEY.md §2.12), resume here is tested.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(state: Any, path: str) -> None:
    """Save a TrainState (or any pytree) to ``{path}`` (overwrites)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.close()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; with ``target`` given, restores matching
    shapes/dtypes/shardings (pass an abstract or concrete template)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is not None:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(
                sharding=getattr(x, "sharding", None),
                dtype=getattr(x, "dtype", None),
            ),
            target,
        )
        out = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(
                item=target, restore_args=restore_args
            )
        )
    else:
        out = ckptr.restore(path)
    ckptr.close()
    return out


def export_safetensors(
    params: Any, out_dir: str, split: bool = True
) -> list:
    """Gather params to host and write reference-layout safetensors.

    ``split=True`` writes ``encoder.safetensors`` + ``decoder.safetensors``
    (the released artifact layout); otherwise one ``model.safetensors``.
    Only process 0 writes.
    """
    from vitok_tpu.utils.params_io import save_safetensors_params

    host_params = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), params
    )
    if jax.process_index() != 0:
        return []
    os.makedirs(out_dir, exist_ok=True)
    written = []
    if split:
        for comp in ("encoder", "decoder"):
            stack_key = f"{comp}_blocks"
            if stack_key in host_params:
                path = os.path.join(out_dir, f"{comp}.safetensors")
                save_safetensors_params(host_params, path, component=comp)
                written.append(path)
    else:
        path = os.path.join(out_dir, "model.safetensors")
        save_safetensors_params(host_params, path)
        written.append(path)
    return written


__all__ = ["save_checkpoint", "load_checkpoint", "export_safetensors"]
