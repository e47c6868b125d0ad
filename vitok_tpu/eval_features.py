"""FID/FDD feature extractors (reference-contract backbones, TPU-native).

The reference hard-wires pytorch_fid's InceptionV3 (pool 2048 @ 299², fed
[0, 1] images with ``normalize_input=False``) for rFID and
``dino_perceptual.DINOModel(model_size='B', target_size=512)`` for rFDD —
``/root/reference/vitok/metrics.py:139-150,223-263``. Both contracts are
reproduced here with pure-JAX backbones so the extractors run on TPU:

* ``inception_feature_fn`` — ``vitok_tpu.models.inception`` (the FID
  variant: count_include_pad=False avg pools, E_2 max-pool patch, BN
  folded), bicubic-resized to 299², clamped, mapped to [0, 1],
* ``dino_feature_fn`` — DINO ViT-B/16 CLS features at 512² via
  ``vitok_tpu.models.vit_features`` (the same backbone family the trainer's
  perceptual loss uses), bicubic-resized, clamped, ImageNet-normalized,
* ``random_projection_feature_fn`` — deterministic random projection;
  weight-free, useful for pipeline tests and relative comparisons.

Weights load from local files (``VITOK_INCEPTION_WEIGHTS`` /
``VITOK_DINO_WEIGHTS`` or explicit paths); random init runs the full
pipeline with a loud warning (relative numbers only — NOT comparable to
published rFID/rFDD).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array
FeatureFn = Callable[[Sequence[Array]], np.ndarray]


@functools.lru_cache(maxsize=128)
def _jitted_group_resize(c: int, h: int, w: int, size: int, method: str):
    """One compiled resize+clamp program per (input shape, target, method)."""

    def f(x):  # [G, C, H, W] -> [G, C, size, size]
        y = jax.image.resize(x, (x.shape[0], c, size, size), method=method)
        return jnp.clip(y, -1.0, 1.0)

    return jax.jit(f)


# ---------------------------------------------------------------------------
# Bucketed resize: one compiled program per BUCKET shape, not per exact
# input shape. The separable resize weights are built host-side per true
# shape and zero-padded to the bucket, so padded pixels contribute exactly
# zero — the result equals the unpadded resize up to contraction-order
# rounding (tested ≤1e-5). This bounds compile count for native-aspect
# evals (the reference's `--pp-mode native`, eval_vae.py:96) where exact
# per-shape jitting compiles O(unique shapes) programs.
# ---------------------------------------------------------------------------

_BUCKET_QUANTUM = 256  # pad H/W up to the next multiple; ≤32 buckets to 8k


def _np_keys_cubic(x: np.ndarray) -> np.ndarray:
    out = ((1.5 * x - 2.5) * x) * x + 1.0
    out = np.where(x >= 1.0, ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0, out)
    return np.where(x >= 2.0, 0.0, out)


def _np_triangle(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


_NP_KERNELS = {
    "bicubic": _np_keys_cubic,
    "cubic": _np_keys_cubic,
    "bilinear": _np_triangle,
    "linear": _np_triangle,
    "triangle": _np_triangle,
}


@functools.lru_cache(maxsize=512)
def _resize_weights_np(in_size: int, out_size: int, method: str,
                       pad_to: int):
    """[pad_to, out_size] f32 separable-resize weights, rows ≥ in_size zero.

    Mirrors ``jax.image.resize``'s ``compute_weight_mat`` (scale =
    out/in, translation 0, antialias=True) in float32 numpy: kernel
    stretched by 1/scale when downsampling, per-output-column weight
    normalization, out-of-range sample columns zeroed.
    """
    kernel = _NP_KERNELS[method]
    scale = np.float32(out_size) / np.float32(in_size)
    inv_scale = np.float32(1.0) / scale
    kernel_scale = max(inv_scale, np.float32(1.0))
    sample_f = (
        (np.arange(out_size, dtype=np.float32) + 0.5) * inv_scale - 0.5
    )
    x = np.abs(
        sample_f[None, :] - np.arange(in_size, dtype=np.float32)[:, None]
    ) / kernel_scale
    weights = kernel(x).astype(np.float32)
    total = weights.sum(axis=0, keepdims=True)
    weights = np.where(
        np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
        weights / np.where(total != 0, total, 1),
        0.0,
    )
    weights = np.where(
        ((sample_f >= -0.5) & (sample_f <= in_size - 0.5))[None, :],
        weights,
        0.0,
    ).astype(np.float32)
    out = np.zeros((pad_to, out_size), np.float32)
    out[:in_size] = weights
    return out


@functools.lru_cache(maxsize=32)
def _jitted_bucket_resize(c: int, hb: int, wb: int, size: int):
    """One compiled program per (bucket shape, target): per-image weight
    matrices ride as data, so every true shape inside the bucket shares it."""

    def f(xpad, wh, ww):  # [G,C,Hb,Wb], [G,Hb,size], [G,Wb,size]
        y = jnp.einsum(
            "gchw,gho,gwp->gcop", xpad, wh, ww,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.clip(y, -1.0, 1.0)

    return jax.jit(f)


def _bucket_up(n: int) -> int:
    return max(_BUCKET_QUANTUM, -(-n // _BUCKET_QUANTUM) * _BUCKET_QUANTUM)


def _resize_batch_bucketed(
    images: Sequence[Array], size: int, method: str
) -> jnp.ndarray:
    groups: dict = {}
    for i, img in enumerate(images):
        x = np.asarray(img, np.float32)
        c, h, w = x.shape
        groups.setdefault((c, _bucket_up(h), _bucket_up(w)), []).append(
            (i, x)
        )
    chunks, order = [], []
    for (c, hb, wb), items in groups.items():
        g = len(items)
        xpad = np.zeros((g, c, hb, wb), np.float32)
        wh = np.empty((g, hb, size), np.float32)
        ww = np.empty((g, wb, size), np.float32)
        for k, (_, x) in enumerate(items):
            xpad[k, :, : x.shape[1], : x.shape[2]] = x
            wh[k] = _resize_weights_np(x.shape[1], size, method, hb)
            ww[k] = _resize_weights_np(x.shape[2], size, method, wb)
        chunks.append(
            _jitted_bucket_resize(c, hb, wb, size)(
                jnp.asarray(xpad), jnp.asarray(wh), jnp.asarray(ww)
            )
        )
        order.extend(i for i, _ in items)
    y = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    if order == sorted(order):
        return y
    inv = np.empty(len(order), np.int32)
    inv[np.asarray(order)] = np.arange(len(order), dtype=np.int32)
    return y[jnp.asarray(inv)]


def _resize_batch(
    images: Sequence[Array], size: int, method: str = "bicubic",
    bucketed: bool = False,
) -> jnp.ndarray:
    """Resize + stack to [B, C, size, size], clamped to [-1, 1] (the
    reference resizes bicubic-antialias then clamps, metrics.py:225-258).

    Images are grouped by input shape and each group is resized in ONE
    jitted call, so a 5k-image eval costs O(unique shapes) dispatches per
    batch — not one dispatch (and one recompile per unique size) per image.
    NaFlex eval batches are bucketed, so unique shapes per batch is small.

    ``bucketed=True`` bounds the COMPILE count too: images pad up to
    _BUCKET_QUANTUM-multiple bucket shapes and the per-shape resize
    weights ride as program data (zero rows over the padding), so a
    native-aspect eval with thousands of unique shapes compiles one
    program per bucket instead of per shape. Equal to the exact path up
    to f32 contraction rounding.
    """
    if bucketed and method in _NP_KERNELS:
        return _resize_batch_bucketed(images, size, method)
    groups: dict = {}
    for i, img in enumerate(images):
        x = jnp.asarray(img, jnp.float32)
        groups.setdefault(x.shape, []).append((i, x))
    if len(groups) == 1:
        (shape, items), = groups.items()
        y = _jitted_group_resize(*shape, size, method)(
            jnp.stack([x for _, x in items])
        )
        return y
    chunks, order = [], []
    for shape, items in groups.items():
        chunks.append(
            _jitted_group_resize(*shape, size, method)(
                jnp.stack([x for _, x in items])
            )
        )
        order.extend(i for i, _ in items)
    inv = np.empty(len(order), np.int32)
    inv[np.asarray(order)] = np.arange(len(order), dtype=np.int32)
    return jnp.concatenate(chunks, axis=0)[jnp.asarray(inv)]


def random_projection_feature_fn(
    dim: int = 192, size: int = 64, seed: int = 0,
    bucketed_resize: bool = False,
) -> FeatureFn:
    """Deterministic random-projection features (weight-free test backbone)."""
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((3 * size * size, dim)).astype(np.float32) / np.sqrt(
        3 * size * size
    )

    def fn(images: Sequence[Array]) -> np.ndarray:
        batch = np.asarray(
            _resize_batch(
                images, size, method="bilinear", bucketed=bucketed_resize
            )
        )
        return batch.reshape(batch.shape[0], -1) @ proj

    return fn


def inception_feature_fn(
    weights: Optional[str] = None,
    size: int = 299,
    _suppress_warning: bool = False,
    bucketed_resize: bool = False,
) -> FeatureFn:
    """pytorch_fid-contract InceptionV3 pool-2048 features (pure JAX).

    ``weights``: pytorch_fid ``pt_inception-2015-12-05`` state-dict path
    (also read from ``VITOK_INCEPTION_WEIGHTS``). Feed: 299² bicubic,
    clamp, [0, 1], no normalization (reference metrics.py:139-146,235-239).
    """
    from vitok_tpu.models.inception import inception_apply, load_inception

    weights = weights or os.environ.get("VITOK_INCEPTION_WEIGHTS")
    if weights is None and _suppress_warning:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            params, _ = load_inception(None)
    else:
        params, _ = load_inception(weights)
    apply = jax.jit(lambda imgs: inception_apply(params, imgs))

    def fn(images: Sequence[Array]) -> np.ndarray:
        batch = _resize_batch(images, size, bucketed=bucketed_resize)
        batch = (batch + 1.0) / 2.0  # [0, 1], reference feed
        return np.asarray(apply(batch))

    return fn


def dino_feature_fn(
    weights: Optional[str] = None,
    size: int = 512,
    model_size: str = "B",
    bucketed_resize: bool = False,
) -> FeatureFn:
    """Reference-contract FDD features: DINO ViT-B/16 CLS @ 512² (pure JAX).

    Mirrors ``DINOModel(model_size='B', target_size=512)``
    (reference metrics.py:149, 248-263): bicubic resize to 512², clamp,
    ImageNet-normalize, CLS token of the final layer.
    """
    from vitok_tpu.models.vit_features import (
        load_dino_backbone,
        make_dino_feature_fn,
    )

    weights = weights or os.environ.get("VITOK_DINO_WEIGHTS")
    params, cfg = load_dino_backbone(weights, size=model_size)
    feat = jax.jit(make_dino_feature_fn(params, cfg, target_size=None))

    def fn(images: Sequence[Array]) -> np.ndarray:
        batch = _resize_batch(images, size, bucketed=bucketed_resize)
        tokens = feat(batch)
        return np.asarray(tokens[:, 0])  # CLS

    return fn


__all__ = [
    "random_projection_feature_fn",
    "inception_feature_fn",
    "dino_feature_fn",
]
