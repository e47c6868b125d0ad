"""FID/FDD feature extractors (pluggable backbones).

The reference hard-wires pytorch_fid's CUDA InceptionV3 (pool 2048 @ 299²)
and an external DINO model (512² features) — ``vitok/metrics.py:140-150``.
Here extractors are factory functions returning jit-able callables mapping a
list of ``[C, H, W]`` images in [-1, 1] to ``[B, F]`` numpy features, so any
local backbone can drive rFID/rFDD. Provided factories:

* ``inception_feature_fn`` — torchvision/pytorch_fid InceptionV3 on the host
  (CPU), when those packages + weights are available,
* ``dino_feature_fn`` — a HF ``transformers`` DINO(v2) backbone when weights
  are cached locally,
* ``random_projection_feature_fn`` — deterministic random projection;
  weight-free, useful for pipeline tests and relative comparisons (NOT
  comparable to published rFID numbers).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array
FeatureFn = Callable[[Sequence[Array]], np.ndarray]


def _resize_batch(images: Sequence[Array], size: int) -> np.ndarray:
    """Host-side bilinear resize + stack to [B, C, size, size] in [-1, 1]."""
    out = []
    for img in images:
        x = jnp.asarray(img, jnp.float32)[None]
        x = jax.image.resize(
            x, (1, x.shape[1], size, size), method="bilinear"
        )
        out.append(np.asarray(x[0]))
    return np.stack(out)


def random_projection_feature_fn(
    dim: int = 192, size: int = 64, seed: int = 0
) -> FeatureFn:
    """Deterministic random-projection features (weight-free test backbone)."""
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((3 * size * size, dim)).astype(np.float32) / np.sqrt(
        3 * size * size
    )

    def fn(images: Sequence[Array]) -> np.ndarray:
        batch = _resize_batch(images, size)
        return batch.reshape(batch.shape[0], -1) @ proj

    return fn


def inception_feature_fn(size: int = 299) -> FeatureFn:
    """pytorch_fid-compatible InceptionV3 pool-2048 features (torch CPU)."""
    try:
        import torch
        from pytorch_fid.inception import InceptionV3  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "rFID parity requires pytorch_fid + torchvision weights; install "
            "them or plug a custom fid_feature_fn into MetricCalculator"
        ) from e

    model = InceptionV3([InceptionV3.BLOCK_INDEX_BY_DIM[2048]]).eval()

    def fn(images: Sequence[Array]) -> np.ndarray:
        batch = _resize_batch(images, size)
        # pytorch_fid expects [0, 1]
        t = torch.tensor((batch + 1.0) / 2.0)
        with torch.no_grad():
            feats = model(t)[0].squeeze(-1).squeeze(-1)
        return feats.numpy()

    return fn


def dino_feature_fn(
    model_name: str = "facebook/dinov2-small", size: int = 518
) -> FeatureFn:
    """DINO(v2) CLS features via HF transformers (FDD backbone)."""
    try:
        import torch
        from transformers import AutoModel
    except ImportError as e:
        raise RuntimeError("FDD requires transformers + torch") from e

    model = AutoModel.from_pretrained(model_name).eval()
    mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]

    def fn(images: Sequence[Array]) -> np.ndarray:
        batch = _resize_batch(images, size)
        batch = ((batch + 1.0) / 2.0 - mean) / std
        with torch.no_grad():
            out = model(pixel_values=torch.tensor(batch))
        return out.pooler_output.numpy()

    return fn


__all__ = [
    "random_projection_feature_fn",
    "inception_feature_fn",
    "dino_feature_fn",
]
