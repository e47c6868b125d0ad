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


def _resize_batch(
    images: Sequence[Array], size: int, method: str = "bicubic"
) -> jnp.ndarray:
    """Resize + stack to [B, C, size, size], clamped to [-1, 1] (the
    reference resizes bicubic-antialias then clamps, metrics.py:225-258).

    Images are grouped by input shape and each group is resized in ONE
    jitted call, so a 5k-image eval costs O(unique shapes) dispatches per
    batch — not one dispatch (and one recompile per unique size) per image.
    NaFlex eval batches are bucketed, so unique shapes per batch is small.
    """
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
    dim: int = 192, size: int = 64, seed: int = 0
) -> FeatureFn:
    """Deterministic random-projection features (weight-free test backbone)."""
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((3 * size * size, dim)).astype(np.float32) / np.sqrt(
        3 * size * size
    )

    def fn(images: Sequence[Array]) -> np.ndarray:
        batch = np.asarray(_resize_batch(images, size, method="bilinear"))
        return batch.reshape(batch.shape[0], -1) @ proj

    return fn


def inception_feature_fn(
    weights: Optional[str] = None,
    size: int = 299,
    _suppress_warning: bool = False,
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
        batch = _resize_batch(images, size)
        batch = (batch + 1.0) / 2.0  # [0, 1], reference feed
        return np.asarray(apply(batch))

    return fn


def dino_feature_fn(
    weights: Optional[str] = None,
    size: int = 512,
    model_size: str = "B",
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
        batch = _resize_batch(images, size)
        tokens = feat(batch)
        return np.asarray(tokens[:, 0])  # CLS

    return fn


__all__ = [
    "random_projection_feature_fn",
    "inception_feature_fn",
    "dino_feature_fn",
]
