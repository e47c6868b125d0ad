"""High-level preprocess/postprocess API.

Parity with reference ``vitok/pp/io.py``: PIL images -> batched NaFlex patch
dict (host-side transform + collate, then one host->device transfer), and
model output -> images (jit-able unpatchify + format conversion + per-image
crop back to original sizes).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from vitok_tpu.pp.ops import unpack, unpatchify
from vitok_tpu.pp.registry import build_transform

Array = jax.Array

DEFAULT_PP = "to_tensor|normalize(minus_one_to_one)|patchify(16, 256)"


def patch_collate_fn(batch: List[dict]) -> Dict[str, np.ndarray]:
    """Collate a list of per-sample patch dicts into stacked numpy arrays.

    Parity with reference ``vitok/data.py:77-94``: dict-of-lists -> stacked
    arrays; scalars become 1-D arrays; non-array values pass through as lists.
    """
    out: Dict[str, np.ndarray] = {}
    keys = batch[0].keys()
    for k in keys:
        vals = [b[k] for b in batch]
        v0 = vals[0]
        if isinstance(v0, np.ndarray) or np.isscalar(v0) or isinstance(
            v0, (int, float, np.integer, np.floating, np.bool_)
        ):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # passthrough (e.g. string labels)
    return out


def preprocess(
    images,
    pp: str = DEFAULT_PP,
    device: Optional[Union[str, jax.Device]] = None,
) -> Dict[str, Array]:
    """Preprocess PIL image(s) into a batched, device-resident patch dict."""
    if not isinstance(images, (list, tuple)):
        images = [images]
    transform = build_transform(pp)
    batched = patch_collate_fn([transform(img) for img in images])

    if isinstance(device, str):
        platform = device
        device = jax.devices(platform)[0]
    elif device is None:
        device = jax.devices()[0]

    return {
        k: (jax.device_put(v, device) if isinstance(v, np.ndarray) else v)
        for k, v in batched.items()
    }


def postprocess(
    output,
    output_format: str = "minus_one_to_one",
    current_format: str = "minus_one_to_one",
    do_unpack: bool = True,
    patch: int = 16,
    max_grid_size: Optional[int] = None,
):
    """Model output (patch dict or image tensor) -> images.

    Returns ``[B, C, H, W]`` array, or a list of per-image crops when
    ``do_unpack=True`` with a patch-dict input.
    """
    if not isinstance(output, dict):
        return _convert_format(jnp.asarray(output), current_format, output_format)

    images = unpatchify(output, patch=patch, max_grid_size=max_grid_size)
    images = _convert_format(images, current_format, output_format)
    if do_unpack:
        orig_h = output.get("orig_height")
        orig_w = output.get("orig_width")
        if orig_h is None or orig_w is None:
            raise ValueError(
                "do_unpack=True requires 'orig_height' and 'orig_width' in output"
            )
        return unpack(images, orig_h, orig_w)
    return images


def _convert_format(images: Array, from_format: str, to_format: str) -> Array:
    """Convert between image value ranges, clamping interpolation overshoot."""
    if from_format == to_format:
        return images

    if to_format == "minus_one_to_one":
        if from_format == "0_255":
            result = images.astype(jnp.float32) / 127.5 - 1.0
        elif from_format == "zero_to_one":
            result = images * 2.0 - 1.0
        else:
            return images
        return jnp.clip(result, -1.0, 1.0)
    if to_format == "zero_to_one":
        if from_format == "0_255":
            result = images.astype(jnp.float32) / 255.0
        elif from_format == "minus_one_to_one":
            result = (images + 1.0) / 2.0
        else:
            return images
        return jnp.clip(result, 0.0, 1.0)
    if to_format == "0_255":
        if from_format == "minus_one_to_one":
            return jnp.round(
                (jnp.clip(images, -1.0, 1.0) + 1.0) / 2.0 * 255
            ).astype(jnp.uint8)
        if from_format == "zero_to_one":
            return jnp.round(jnp.clip(images, 0.0, 1.0) * 255).astype(jnp.uint8)
    return images


# Aliases for parity with the reference module.
preprocess_images = preprocess
postprocess_images = postprocess

__all__ = [
    "preprocess",
    "postprocess",
    "patch_collate_fn",
    "preprocess_images",
    "postprocess_images",
    "DEFAULT_PP",
]
