"""Normalization and scaling primitives as pure JAX functions.

Capability parity with the reference modules
(``vitok/models/modules/norm.py``, ``layerscale.py`` in Na-VAE/vitok-release):
all statistics are computed in float32 and the result is cast back to the
input dtype, which is the numerically-stable recipe for bf16 networks on TPU.
XLA fuses these elementwise chains into the surrounding matmuls, so there is
no benefit to hand-writing Pallas kernels for them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rms_norm(x: Array, scale: Array, eps: float = 1e-6) -> Array:
    """RMSNorm over the last axis, fp32 compute, cast back to input dtype.

    Args:
        x: ``[..., D]`` activations.
        scale: ``[D]`` learnable gain (reference init: ones).
        eps: stability epsilon.
    """
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x: Array, eps: float = 1e-6) -> Array:
    """Affine-free LayerNorm over the last axis, fp32 compute.

    Used as the latent normalizer (``output_fn`` in the reference AE,
    ae.py:122): the latent code is whitened to ~N(0, 1) without learnable
    shift/scale.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def layer_scale(x: Array, gamma: Array) -> Array:
    """Learnable per-channel residual scaling (gamma init 1e-4 in the AE)."""
    return x * gamma.astype(x.dtype)


__all__ = ["rms_norm", "layer_norm", "layer_scale"]
