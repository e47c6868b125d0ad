"""Rotary position embeddings (1D and 2D) as pure JAX functions.

Capability parity with the reference implementation
(``vitok/models/modules/rotary_embedding.py`` in Na-VAE/vitok-release),
re-designed for TPU/XLA:

* frequencies are computed in float32 for numerical stability, then the
  rotation itself runs in the activation dtype (bf16-safe),
* the rotation uses the *interleaved* (even/odd pair) convention: element
  ``2i`` is the real part and ``2i+1`` the imaginary part of complex pair
  ``i`` — matching reference ``apply_rotary_emb``
  (rotary_embedding.py:101-129),
* 2D RoPE splits the head dimension in half: the first half rotates by the
  patch-grid row coordinate, the second half by the column coordinate
  (rotary_embedding.py:46-75); requires ``dim % 4 == 0``.

Everything here is shape-polymorphic, jit-friendly, and free of Python-level
data-dependent control flow.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def compute_inv_freq(dim: int, theta: float = 10000.0) -> Array:
    """Inverse frequencies ``1 / theta^(2i/dim)`` for one rotary axis.

    Args:
        dim: rotary dimension of the axis (must be even); produces ``dim//2``
            frequencies.
        theta: RoPE base.

    Returns:
        float32 array of shape ``[dim // 2]``.
    """
    if dim % 2 != 0:
        raise ValueError(f"RoPE axis dimension must be even, got dim={dim}")
    exponents = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    return 1.0 / (theta ** exponents)


def _axis_freqs(
    positions: Array,
    dim: int,
    theta: float,
    inv_freq: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """cos/sin tables for a single axis. Shapes: positions [...], out [..., dim//2]."""
    if inv_freq is None:
        inv_freq = compute_inv_freq(dim, theta)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(freqs), jnp.sin(freqs)


def compute_freqs_cis(
    t: Array,
    dim: int = 768,
    theta: float = 10000.0,
    inv_freq: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """1D rotary cos/sin for sequence positions ``t``.

    Returns ``(cos, sin)`` of shape ``t.shape + (dim // 2,)``, float32.
    """
    return _axis_freqs(t, dim, theta, inv_freq)


def compute_2d_freqs_cis(
    y_positions: Array,
    x_positions: Array,
    dim: int,
    theta: float = 10000.0,
    inv_freq: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """2D rotary cos/sin for spatial (row, col) patch coordinates.

    The head dimension is split in half: the first ``dim//2`` rotary lanes
    encode the row coordinate, the second ``dim//2`` the column. Each axis
    contributes ``dim//4`` distinct frequencies.

    Args:
        y_positions: ``[..., N]`` row indices (any int/float dtype).
        x_positions: ``[..., N]`` col indices, same shape as ``y_positions``.
        dim: full head dimension; must be divisible by 4.
        theta: RoPE base.
        inv_freq: optional precomputed ``compute_inv_freq(dim // 2, theta)``.

    Returns:
        ``(cos, sin)`` of shape ``y_positions.shape + (dim // 2,)``, float32.
    """
    if y_positions.shape != x_positions.shape:
        raise ValueError("x_positions and y_positions must have matching shapes")
    if dim % 4 != 0:
        raise ValueError("2D RoPE requires head dimension divisible by 4")
    axis_dim = dim // 2
    cos_y, sin_y = _axis_freqs(y_positions, axis_dim, theta, inv_freq)
    cos_x, sin_x = _axis_freqs(x_positions, axis_dim, theta, inv_freq)
    return (
        jnp.concatenate([cos_y, cos_x], axis=-1),
        jnp.concatenate([sin_y, sin_x], axis=-1),
    )


def rope_half_permutation(head_dim: int):
    """Channel permutation mapping interleaved RoPE layout to split-half.

    ``perm[i]`` is the interleaved-layout channel that lands at half-layout
    position ``i``: reals ``(0, 2, 4, ...)`` first, imaginaries
    ``(1, 3, 5, ...)`` second. Applying this permutation to the q/k
    projection output channels (weights, biases, per-channel QK-norm
    scales) converts a checkpoint to the ``convention="half"`` rotation,
    which avoids lane interleaving on TPU. Attention is exactly invariant
    to the re-ordering because q and k permute identically.
    """
    import numpy as np

    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )


def apply_rotary_emb(
    xq: Array,
    xk: Array,
    freqs_cos: Array,
    freqs_sin: Array,
    convention: str = "interleaved",
) -> Tuple[Array, Array]:
    """Rotate query/key tensors by precomputed cos/sin tables.

    Conventions:

    * ``"interleaved"`` — lanes ``(2i, 2i+1)`` form the complex pair rotated
      by frequency ``i``, matching reference ``apply_rotary_emb``
      (rotary_embedding.py:101-129). Deinterleaving the minor (lane) axis
      is expensive on TPU — profiled at ~45% of GEMM time on the 5B int8
      forward — so the model path uses:
    * ``"half"`` — channel ``i`` pairs with ``i + D/2`` (rotate-half, the
      GPT-NeoX/LLaMA-JAX layout): two contiguous half-width slices, no lane
      shuffles. Checkpoints convert via ``rope_half_permutation`` at load
      time (``utils/params_io.py``), keeping exact numerical parity.

    The rotation runs in the input dtype (bf16-safe); the tables should
    have been computed in float32.

    Args:
        xq, xk: ``[B, N, H, D]`` (or any layout with trailing head dim D and a
            token axis broadcast-compatible with the tables).
        freqs_cos, freqs_sin: ``[B, N, D//2]`` or ``[N, D//2]``.

    Returns:
        Rotated ``(xq, xk)`` with the input shapes and dtypes.
    """
    dtype = xq.dtype

    def _rotate_interleaved(x: Array) -> Array:
        pairs = x.reshape(*x.shape[:-1], -1, 2)
        xr, xi = pairs[..., 0], pairs[..., 1]
        cos, sin = _broadcast_tables(freqs_cos, freqs_sin, xr)
        out_r = xr * cos - xi * sin
        out_i = xr * sin + xi * cos
        return jnp.stack([out_r, out_i], axis=-1).reshape(x.shape)

    def _rotate_half(x: Array) -> Array:
        d2 = x.shape[-1] // 2
        xr, xi = x[..., :d2], x[..., d2:]
        cos, sin = _broadcast_tables(freqs_cos, freqs_sin, xr)
        return jnp.concatenate(
            [xr * cos - xi * sin, xr * sin + xi * cos], axis=-1
        )

    cast = lambda a: a.astype(dtype)
    freqs_cos, freqs_sin = cast(freqs_cos), cast(freqs_sin)
    if convention == "half":
        return _rotate_half(xq), _rotate_half(xk)
    if convention != "interleaved":
        raise ValueError(f"Unknown RoPE convention: {convention!r}")
    return _rotate_interleaved(xq), _rotate_interleaved(xk)


def _broadcast_tables(cos: Array, sin: Array, xr: Array) -> Tuple[Array, Array]:
    """Reshape [B, N, D2] or [N, D2] tables to broadcast against xr.

    ``xr`` is ``[..., N, H, D2]`` (B,N,H,D layout) or ``[..., H, N, D2]``
    (B,H,N,D layout). Mirrors reference ``reshape_for_broadcast``
    (rotary_embedding.py:78-99).
    """
    ndim = xr.ndim
    if cos.ndim == 2 and cos.shape == (xr.shape[-2], xr.shape[-1]):
        # [N, D2] with xr [..., N, D2] (already aligned) — broadcast over batch/head.
        return cos, sin
    if cos.ndim == 3 and cos.shape == (xr.shape[0], xr.shape[-2], xr.shape[-1]):
        # [B, N, D2] with xr [B, H, N, D2] -> insert head axis at 1.
        shape = (xr.shape[0],) + (1,) * (ndim - 3) + (xr.shape[-2], xr.shape[-1])
        return cos.reshape(shape), sin.reshape(shape)
    if cos.ndim == 3 and cos.shape == (xr.shape[0], xr.shape[1], xr.shape[-1]):
        # [B, N, D2] with xr [B, N, H, D2] -> insert head axis at 2.
        shape = (xr.shape[0], xr.shape[1], 1, xr.shape[-1])
        return cos.reshape(shape), sin.reshape(shape)
    raise ValueError(
        f"freqs shape {cos.shape} incompatible with rotated input shape {xr.shape}"
    )


__all__ = [
    "compute_inv_freq",
    "compute_freqs_cis",
    "compute_2d_freqs_cis",
    "apply_rotary_emb",
    "rope_half_permutation",
]
