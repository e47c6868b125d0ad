"""Device mesh construction for dp/fsdp/tp sharding.

Replaces the reference's NCCL process-group + 1-D FSDP2 device-mesh setup
(``vitok/utils.py:44-89`` in Na-VAE/vitok-release) with the JAX-native
equivalent: one ``jax.sharding.Mesh`` whose named axes drive every
collective through XLA over ICI/DCN. Multi-host initialization is a single
``jax.distributed.initialize()``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

# Canonical axis names. "data" = batch (DDP-equivalent), "fsdp" = parameter
# sharding (ZeRO-3-equivalent), "model" = tensor parallel over heads/ffn.
DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"


def create_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh over the available devices.

    Args:
        axes: ordered mapping axis-name -> size, e.g. ``{"data": 2,
            "fsdp": 2, "model": 2}``. A single ``-1`` entry absorbs the
            remaining devices. Defaults to all devices on the ``data`` axis.
        devices: devices to use (default ``jax.devices()``).

    Returns:
        ``jax.sharding.Mesh`` with the requested axis names.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axes is None:
        axes = {DATA_AXIS: n}

    sizes = dict(axes)
    wildcards = [k for k, v in sizes.items() if v == -1]
    if len(wildcards) > 1:
        raise ValueError("At most one axis may be -1")
    fixed = int(np.prod([v for v in sizes.values() if v != -1]))
    if wildcards:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[wildcards[0]] = n // fixed
    total = int(np.prod(list(sizes.values())))
    if total != n:
        raise ValueError(
            f"Mesh axes {sizes} require {total} devices but {n} are available"
        )

    dev_array = np.asarray(devices).reshape(tuple(sizes.values()))
    return Mesh(dev_array, tuple(sizes.keys()))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (TPU pods / multi-slice). No-op on a single host.

    The TPU-native analog of the reference's ``setup_distributed``
    env-var/NCCL dance — on TPU pods jax autodetects everything.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


__all__ = [
    "create_mesh",
    "initialize_distributed",
    "DATA_AXIS",
    "FSDP_AXIS",
    "MODEL_AXIS",
]
