"""SwiGLU MLP as a pure function over a params pytree.

Parity with reference ``vitok/models/modules/mlp.py``: ``fc1`` projects to
``2 * hidden``; the first half is the value branch ``v`` and the second half
the gate ``g``; output is ``fc2(silu(g) * v)``. The hidden width is rounded
with the reference's exact rule ``((h + 8) // 16) * 16`` (mlp.py:14) so that
imported checkpoints match shape-for-shape. On TPU the two matmuls are large
MXU GEMMs and the silu/multiply fuses into them under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def round_hidden_dim(hidden_dim: int) -> int:
    """Reference hidden rounding: nearest multiple of 16 (ties upward)."""
    return ((hidden_dim + 8) // 16) * 16


def swiglu(x: Array, fc1_kernel: Array, fc2_kernel: Array) -> Array:
    """Apply the SwiGLU MLP.

    Args:
        x: ``[..., D]``.
        fc1_kernel: ``[D, 2H]`` (input-major layout; torch ``weight.T``).
        fc2_kernel: ``[H, D]``.
    """
    h = jnp.dot(x, fc1_kernel.astype(x.dtype), preferred_element_type=jnp.float32)
    h = h.astype(x.dtype)
    v, g = jnp.split(h, 2, axis=-1)
    gated = jax.nn.silu(g) * v
    out = jnp.dot(gated, fc2_kernel.astype(x.dtype), preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


__all__ = ["swiglu", "round_hidden_dim"]
