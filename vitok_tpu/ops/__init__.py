"""TPU-native compute primitives (pure functions + Pallas kernels)."""

from vitok_tpu.ops.rope import (
    compute_inv_freq,
    compute_freqs_cis,
    compute_2d_freqs_cis,
    apply_rotary_emb,
)
from vitok_tpu.ops.norms import rms_norm, layer_norm, layer_scale
from vitok_tpu.ops.mlp import swiglu, round_hidden_dim
from vitok_tpu.ops.attention import dot_product_attention, make_attention_mask

__all__ = [
    "compute_inv_freq",
    "compute_freqs_cis",
    "compute_2d_freqs_cis",
    "apply_rotary_emb",
    "rms_norm",
    "layer_norm",
    "layer_scale",
    "swiglu",
    "round_hidden_dim",
    "dot_product_attention",
    "make_attention_mask",
]
