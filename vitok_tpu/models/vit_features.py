"""Pure-JAX DINO-style ViT feature backbone (perceptual loss + FDD).

The reference trains with an external ``dino_perceptual.DINOPerceptual``
module (ViT-S DINO features on 256² tiles, weight 500.0 —
``scripts/train_vae.py:101-102,254-259,362-366`` in Na-VAE/vitok-release) and
computes FDD eval features with a DINO model at 512²
(``vitok/metrics.py:140-150``). Both need the same backbone: a plain
pre-LN ViT with learned position embeddings. This module implements that
backbone TPU-natively:

* params are a plain pytree; per-block weights are **stacked depth-leading**
  and run under ``lax.scan`` (same invariant as ``models/ae.py``),
* the patch conv is an unfold+GEMM (reshape + one matmul on the MXU),
* norms compute in fp32 and cast back; matmuls accumulate in fp32,
* position embeddings bilinearly interpolate to any (static) grid, so the
  same weights serve 224² pretraining, 256² perceptual tiles and 512² FDD,
* a torch/timm flat-name interchange (``torch_vit_state_to_pytree``) loads
  real DINO/timm checkpoints when available; random init otherwise.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vitok_tpu.ops.attention import dot_product_attention

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class ViTCfg:
    """Standard ViT geometry (timm ``vit_<size>_patch16_224`` layouts)."""

    width: int = 384
    depth: int = 12
    heads: int = 6
    patch: int = 16
    img_size: int = 224  # grid the stored pos_embed was trained at
    mlp_ratio: float = 4.0
    attn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def hidden(self) -> int:
        return int(self.width * self.mlp_ratio)

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


def dino_vit_s16(**kw) -> ViTCfg:
    """DINO ViT-S/16 (the reference perceptual backbone size)."""
    return ViTCfg(width=384, depth=12, heads=6, patch=16, **kw)


def dino_vit_b16(**kw) -> ViTCfg:
    """DINO ViT-B/16 (the reference FDD backbone size)."""
    return ViTCfg(width=768, depth=12, heads=12, patch=16, **kw)


def init_vit_params(
    cfg: ViTCfg, key: Array, dtype=jnp.float32
) -> Params:
    """Random (trunc-normal 0.02) init — for tests and weight-free runs."""
    d, l, h = cfg.width, cfg.depth, cfg.hidden
    pdim = cfg.patch * cfg.patch * 3
    n = cfg.grid * cfg.grid
    ks = jax.random.split(key, 8)

    def tn(k, shape, std=0.02):
        return (
            jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32) * std
        ).astype(dtype)

    return {
        "patch_embed": {"kernel": tn(ks[0], (pdim, d)), "bias": jnp.zeros((d,), dtype)},
        "cls_token": tn(ks[1], (1, 1, d)),
        "pos_embed": tn(ks[2], (1, 1 + n, d)),
        "blocks": {
            "norm1": {"scale": jnp.ones((l, d), dtype), "bias": jnp.zeros((l, d), dtype)},
            "qkv": {"kernel": tn(ks[3], (l, d, 3 * d)), "bias": jnp.zeros((l, 3 * d), dtype)},
            "proj": {"kernel": tn(ks[4], (l, d, d)), "bias": jnp.zeros((l, d), dtype)},
            "norm2": {"scale": jnp.ones((l, d), dtype), "bias": jnp.zeros((l, d), dtype)},
            "fc1": {"kernel": tn(ks[5], (l, d, h)), "bias": jnp.zeros((l, h), dtype)},
            "fc2": {"kernel": tn(ks[6], (l, h, d)), "bias": jnp.zeros((l, d), dtype)},
        },
        "norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def _affine_ln(x: Array, scale: Array, bias: Array, eps: float = 1e-6) -> Array:
    """LayerNorm with affine, fp32 math, cast back (project invariant)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def _linear(x: Array, kernel: Array, bias: Array) -> Array:
    y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def _patchify_conv_order(images: Array, patch: int) -> Array:
    """[B,3,H,W] -> [B, N, 3*P*P] with torch-conv (c, ph, pw) pixel order."""
    b, c, hh, ww = images.shape
    gh, gw = hh // patch, ww // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, c, P, P]
    return x.reshape(b, gh * gw, c * patch * patch)


def interpolate_pos_embed(
    pos_embed: Array, src_grid: int, dst: Tuple[int, int]
) -> Array:
    """Bilinear pos-embed interpolation (cls slot passes through)."""
    gh, gw = dst
    if (gh, gw) == (src_grid, src_grid):
        return pos_embed
    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
    pe = patch_pe.reshape(1, src_grid, src_grid, -1).astype(jnp.float32)
    pe = jax.image.resize(pe, (1, gh, gw, pe.shape[-1]), method="bilinear")
    pe = pe.reshape(1, gh * gw, -1).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pe, pe], axis=1)


def vit_apply(
    params: Params,
    images: Array,
    cfg: ViTCfg,
    compute_dtype=jnp.float32,
) -> Array:
    """ViT forward: ``[B, 3, H, W]`` (already normalized) -> tokens
    ``[B, 1+N, D]`` after the final LayerNorm. H, W must be multiples of
    ``cfg.patch`` (static shapes; jit/grad-safe).
    """
    b, _, hh, ww = images.shape
    gh, gw = hh // cfg.patch, ww // cfg.patch
    x = _patchify_conv_order(images.astype(compute_dtype), cfg.patch)
    x = _linear(x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pe = interpolate_pos_embed(params["pos_embed"], cfg.grid, (gh, gw))
    x = x + pe.astype(compute_dtype)

    nh, hd = cfg.heads, cfg.head_dim

    def body(carry: Array, blk) -> Tuple[Array, None]:
        h = _affine_ln(carry, blk["norm1"]["scale"], blk["norm1"]["bias"])
        qkv = _linear(h, blk["qkv"]["kernel"], blk["qkv"]["bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(qkv.shape[0], n, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = dot_product_attention(q, k, v, impl=cfg.attn_impl)
        a = a.reshape(a.shape[0], n, nh * hd)
        carry = carry + _linear(a, blk["proj"]["kernel"], blk["proj"]["bias"])
        h = _affine_ln(carry, blk["norm2"]["scale"], blk["norm2"]["bias"])
        h = _linear(h, blk["fc1"]["kernel"], blk["fc1"]["bias"])
        # exact (erf) GELU: timm/DINO semantics, not the tanh approximation
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        carry = carry + _linear(h, blk["fc2"]["kernel"], blk["fc2"]["bias"])
        return carry, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _affine_ln(x, params["norm"]["scale"], params["norm"]["bias"])


# ---------------------------------------------------------------------------
# Perceptual / FDD feature fns
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)


def make_dino_feature_fn(
    params: Params,
    cfg: ViTCfg,
    target_size: Optional[int] = None,
    compute_dtype=jnp.float32,
) -> Callable[[Array], Array]:
    """jit/grad-safe ``[B, 3, H, W] in [-1, 1] -> [B, 1+N, D]`` features.

    ImageNet-normalizes inside (the DINO input contract), optionally
    resizing to ``target_size`` first — mirrors
    ``DINOPerceptual(model_size='S', target_size=tile_size)`` in the
    reference trainer.
    """
    mean = jnp.asarray((_IMAGENET_MEAN * 2.0) - 1.0)  # in [-1,1] space
    std = jnp.asarray(_IMAGENET_STD * 2.0)

    def fn(images: Array) -> Array:
        x = images.astype(jnp.float32)
        if target_size is not None and images.shape[-2:] != (
            target_size,
            target_size,
        ):
            x = jax.image.resize(
                x,
                (*x.shape[:2], target_size, target_size),
                method="bilinear",
            )
        x = (x - mean) / std
        return vit_apply(params, x, cfg, compute_dtype=compute_dtype)

    return fn


# ---------------------------------------------------------------------------
# torch/timm flat-name interchange (DINO checkpoints use timm ViT naming)
# ---------------------------------------------------------------------------


def torch_vit_state_to_pytree(state: Dict, cfg: ViTCfg) -> Params:
    """timm/DINO ``state_dict`` (flat names, torch [out, in] kernels) ->
    stacked depth-leading pytree. Accepts torch tensors or numpy arrays.
    """

    def get(name):
        t = state[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i)) for i in range(cfg.depth)]
        out = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(out)

    pe_w = get("patch_embed.proj.weight")  # [D, 3, P, P]
    return {
        "patch_embed": {
            "kernel": jnp.asarray(pe_w.reshape(cfg.width, -1).T),
            "bias": jnp.asarray(get("patch_embed.proj.bias")),
        },
        "cls_token": jnp.asarray(get("cls_token")),
        "pos_embed": jnp.asarray(get("pos_embed")),
        "blocks": {
            "norm1": {
                "scale": stack("blocks.{}.norm1.weight"),
                "bias": stack("blocks.{}.norm1.bias"),
            },
            "qkv": {
                "kernel": stack("blocks.{}.attn.qkv.weight", transpose=True),
                "bias": stack("blocks.{}.attn.qkv.bias"),
            },
            "proj": {
                "kernel": stack("blocks.{}.attn.proj.weight", transpose=True),
                "bias": stack("blocks.{}.attn.proj.bias"),
            },
            "norm2": {
                "scale": stack("blocks.{}.norm2.weight"),
                "bias": stack("blocks.{}.norm2.bias"),
            },
            "fc1": {
                "kernel": stack("blocks.{}.mlp.fc1.weight", transpose=True),
                "bias": stack("blocks.{}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": stack("blocks.{}.mlp.fc2.weight", transpose=True),
                "bias": stack("blocks.{}.mlp.fc2.bias"),
            },
        },
        "norm": {"scale": jnp.asarray(get("norm.weight")), "bias": jnp.asarray(get("norm.bias"))},
    }


def load_dino_backbone(
    weights: Optional[str],
    size: str = "S",
    target_size: Optional[int] = None,
    attn_impl: str = "auto",
) -> Tuple[Params, ViTCfg]:
    """Load a DINO ViT backbone for the perceptual loss / FDD features.

    ``weights`` may be a local ``.pth``/``.safetensors`` path with a
    timm-named state dict. ``None`` random-inits (loud warning) — features
    are still a meaningful smoothness prior but NOT comparable to
    DINO-trained runs.
    """
    cfg = (dino_vit_s16 if size.upper() == "S" else dino_vit_b16)(
        attn_impl=attn_impl
    )
    if weights is None:
        import warnings

        warnings.warn(
            "DINO weights not provided; using a random-init ViT backbone. "
            "Set --dino-weights / VITOK_DINO_WEIGHTS for DINO-parity "
            "perceptual training.",
            stacklevel=2,
        )
        return init_vit_params(cfg, jax.random.key(42)), cfg

    if weights.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(weights)
    else:
        import torch

        state = torch.load(weights, map_location="cpu", weights_only=True)
        if isinstance(state, dict):
            for key in ("state_dict", "model", "teacher", "student"):
                if key in state and isinstance(state[key], dict):
                    state = state[key]
                    break
        state = {
            k.removeprefix("module.").removeprefix("backbone."): v
            for k, v in state.items()
        }
    # Infer geometry from the checkpoint when it disagrees with the preset.
    pe = state["pos_embed"]
    n_tokens = (pe.shape[1] if hasattr(pe, "shape") else np.asarray(pe).shape[1]) - 1
    grid = int(math.isqrt(n_tokens))
    if grid * grid == n_tokens and grid != cfg.grid:
        cfg = dataclasses.replace(cfg, img_size=grid * cfg.patch)
    params = torch_vit_state_to_pytree(state, cfg)
    return params, cfg


__all__ = [
    "ViTCfg",
    "dino_vit_s16",
    "dino_vit_b16",
    "init_vit_params",
    "vit_apply",
    "interpolate_pos_embed",
    "make_dino_feature_fn",
    "torch_vit_state_to_pytree",
    "load_dino_backbone",
]
