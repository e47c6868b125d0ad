"""Model definitions."""

from vitok_tpu.models.ae import (
    AE,
    AEConfig,
    Model,
    decode_variant,
    init_params,
    num_params,
    encode_apply,
    decode_apply,
    forward_apply,
)

__all__ = [
    "AE",
    "AEConfig",
    "Model",
    "decode_variant",
    "init_params",
    "num_params",
    "encode_apply",
    "decode_apply",
    "forward_apply",
]
