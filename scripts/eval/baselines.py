"""Baseline VAE wrappers for eval comparisons.

Capability parity with reference ``scripts/eval/baselines.py``
(Na-VAE/vitok-release): a unified ``BaselineVAE`` over third-party
convolutional VAEs (FLUX.2, SDXL fp16-fix, SD ft-mse, Qwen, DC-AE f32/f64)
exposing the same surface the eval harness needs — ``spatial_stride``,
stride-aligned reflect padding before encode and crop-back after decode,
latent scale/shift factors — so rFID tables can include the same baseline
rows as the reference's published results.

TPU-native stance: the wrapper logic (registry, stride geometry, pad/crop,
scaling) is pure JAX and fully tested with an injected fake autoencoder; the
heavyweight pretrained backbones load lazily via diffusers' Flax models when
``diffusers`` + weights are available (this image has neither — zero egress),
raising a clear error otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BaselineSpec:
    repo: str
    spatial_stride: int
    latent_channels: int
    scaling_factor: float
    shift_factor: float = 0.0
    subfolder: Optional[str] = "vae"
    dtype: str = "bfloat16"


# Registry mirrors the reference's baseline set (baselines.py:23-67).
BASELINES: Dict[str, BaselineSpec] = {
    "flux": BaselineSpec(
        "black-forest-labs/FLUX.2-dev", 8, 16, 0.3611, 0.1159
    ),
    "sdxl": BaselineSpec(
        "madebyollin/sdxl-vae-fp16-fix", 8, 4, 0.13025, 0.0, subfolder=None
    ),
    "sd": BaselineSpec(
        "stabilityai/sd-vae-ft-mse", 8, 4, 0.18215, 0.0, subfolder=None
    ),
    "qwen": BaselineSpec("Qwen/Qwen-Image", 8, 16, 1.0, 0.0),
    "dc-ae-f32": BaselineSpec(
        "mit-han-lab/dc-ae-f32c32-sana-1.0-diffusers", 32, 32, 0.41407,
        subfolder=None,
    ),
    "dc-ae-f64": BaselineSpec(
        "mit-han-lab/dc-ae-f64c128-mix-1.0-diffusers", 64, 128, 0.2889,
        subfolder=None,
    ),
}


def pad_to_stride(images: Array, stride: int) -> Tuple[Array, int, int]:
    """Reflect-pad H/W up to a stride multiple (reference pad-then-crop)."""
    b, c, h, w = images.shape
    ph = (stride - h % stride) % stride
    pw = (stride - w % stride) % stride
    if ph or pw:
        images = jnp.pad(
            images, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect"
        )
    return images, h, w


class BaselineVAE:
    """Unified baseline wrapper: ``__call__(images [B,C,H,W] in [-1,1])`` ->
    reconstruction at the same size.

    ``autoencoder`` injects a backend for testing: an object with
    ``encode(x) -> latents`` and ``decode(latents) -> x``; by default the
    pretrained diffusers Flax VAE is loaded lazily.
    """

    def __init__(
        self,
        name: str,
        autoencoder: Optional[object] = None,
        dtype=jnp.bfloat16,
    ):
        if name not in BASELINES:
            raise KeyError(
                f"Unknown baseline: {name}. Available: {list(BASELINES)}"
            )
        self.name = name
        self.spec = BASELINES[name]
        self.dtype = dtype
        self._ae = autoencoder

    @property
    def spatial_stride(self) -> int:
        return self.spec.spatial_stride

    @property
    def latent_channels(self) -> int:
        return self.spec.latent_channels

    def _backend(self):
        if self._ae is None:
            try:
                from diffusers import FlaxAutoencoderKL  # type: ignore
            except ImportError as e:
                raise RuntimeError(
                    f"Baseline '{self.name}' needs the diffusers package and "
                    f"weights from {self.spec.repo}; neither is available in "
                    "this environment. Inject `autoencoder=` for testing."
                ) from e
            model, params = FlaxAutoencoderKL.from_pretrained(
                self.spec.repo, subfolder=self.spec.subfolder, dtype=self.dtype
            )

            class _Diffusers:
                def encode(s, x):
                    return model.apply(
                        {"params": params}, x, method=model.encode
                    ).latent_dist.mean

                def decode(s, z):
                    return model.apply(
                        {"params": params}, z, method=model.decode
                    ).sample

            self._ae = _Diffusers()
        return self._ae

    def encode(self, images: Array) -> Tuple[Array, int, int]:
        """[-1,1] images -> scaled latents (+ original size for crop-back)."""
        images, h, w = pad_to_stride(
            jnp.asarray(images, self.dtype), self.spatial_stride
        )
        latents = self._backend().encode(images)
        latents = (latents - self.spec.shift_factor) * self.spec.scaling_factor
        return latents, h, w

    def decode(self, latents: Array, orig_h: int, orig_w: int) -> Array:
        latents = latents / self.spec.scaling_factor + self.spec.shift_factor
        images = self._backend().decode(latents)
        return images[:, :, :orig_h, :orig_w]

    def __call__(self, images: Array) -> Array:
        latents, h, w = self.encode(images)
        return self.decode(latents, h, w)


__all__ = ["BaselineVAE", "BASELINES", "BaselineSpec", "pad_to_stride"]
