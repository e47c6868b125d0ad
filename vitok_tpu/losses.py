"""Training losses: masked Charbonnier, SSIM, perceptual hook.

Parity with the reference training loop's loss stack
(``scripts/train_vae.py:314-368`` in Na-VAE/vitok-release): masked
Charbonnier on patches (weight 1.0), SSIM on sampled tiles (weight 0.1), and
a DINO perceptual term (weight 500.0, pluggable feature extractor). All pure
JAX, jit/grad-safe, fp32 accumulation.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def charbonnier_loss(
    pred: Array,
    target: Array,
    patch_mask: Optional[Array] = None,
    eps: float = 1e-3,
) -> Array:
    """Masked Charbonnier (smooth-L1) loss over NaFlex patches.

    ``sqrt(diff² + eps²)`` averaged over patch pixels, then mask-weighted
    mean over tokens per image, then batch mean (reference
    train_vae.py:314-322).
    """
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    per_token = jnp.mean(jnp.sqrt(diff * diff + eps * eps), axis=-1)  # [B, N]
    if patch_mask is None:
        return jnp.mean(per_token)
    m = patch_mask.astype(jnp.float32)
    per_image = jnp.sum(per_token * m, axis=-1) / jnp.maximum(
        jnp.sum(m, axis=-1), 1.0
    )
    return jnp.mean(per_image)


def _gaussian_kernel(size: int, sigma: float) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def ssim(
    x: Array,
    y: Array,
    data_range: float = 2.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    reduce: bool = True,
) -> Array:
    """Structural similarity over ``[B, C, H, W]`` images (gaussian window).

    Matches the torchmetrics functional recipe the reference uses
    (``vitok/metrics.py:96-107``): gaussian 11×11 σ=1.5, padded 'valid', with
    the kernel clamped to the image size (odd) for small inputs.
    """
    b, c, h, w = x.shape
    k = min(kernel_size, h, w)
    if k % 2 == 0:
        k -= 1
    kern = _gaussian_kernel(k, sigma)
    # Separable depthwise gaussian in NHWC — the TPU-native conv layout; a
    # dense 11x11 NCHW depthwise conv here cost ~300ms/step in training.
    k_col = jnp.tile(kern.reshape(k, 1, 1, 1), (1, 1, 1, c))  # [k,1,1,C]
    k_row = jnp.tile(kern.reshape(1, k, 1, 1), (1, 1, 1, c))  # [1,k,1,C]

    def filt(img):  # img: [B, H, W, C]
        out = jax.lax.conv_general_dilated(
            img, k_col, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return jax.lax.conv_general_dilated(
            out, k_row, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    xn = x.astype(jnp.float32).transpose(0, 2, 3, 1)
    yn = y.astype(jnp.float32).transpose(0, 2, 3, 1)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x = filt(xn)
    mu_y = filt(yn)
    mu_xx = filt(xn * xn) - mu_x * mu_x
    mu_yy = filt(yn * yn) - mu_y * mu_y
    mu_xy = filt(xn * yn) - mu_x * mu_y
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * mu_xy + c2)) / (
        (mu_x * mu_x + mu_y * mu_y + c1) * (mu_xx + mu_yy + c2)
    )
    per_image = jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(per_image) if reduce else per_image


def ssim_loss(x: Array, y: Array, **kw) -> Array:
    """1 - SSIM (minimization form used by the reference trainer)."""
    return 1.0 - ssim(x, y, **kw)


def psnr(
    x: Array, y: Array, data_range: float = 2.0, reduce: bool = True
) -> Array:
    """Peak signal-to-noise ratio over ``[B, C, H, W]`` (or any) images."""
    axes = tuple(range(1, x.ndim))
    mse = jnp.mean(
        (x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2, axis=axes
    )
    val = 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))
    return jnp.mean(val) if reduce else val


def perceptual_loss(
    feature_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
) -> Array:
    """Feature-space L2 between tiles (DINO-perceptual hook).

    ``feature_fn`` maps ``[B, C, H, W]`` -> features; the reference uses an
    external DINO ViT-S (train_vae.py:254-259). Any jit-able extractor works.
    """
    fx = feature_fn(x)
    fy = feature_fn(y)
    return jnp.mean((fx.astype(jnp.float32) - fy.astype(jnp.float32)) ** 2)


__all__ = ["charbonnier_loss", "ssim", "ssim_loss", "psnr", "perceptual_loss"]
