"""Pretrained model registry and loading.

Parity with reference ``vitok/pretrained.py`` (Na-VAE/vitok-release): the
same 9-model registry (name -> HF repo + split encoder/decoder safetensors +
variant string) and API (``load_pretrained``/``list_pretrained``/
``get_pretrained_info``/``download_pretrained``), plus a TPU-native extra:
``load_pretrained_params`` returns our stacked scan-layout pytree directly,
ready to jit/shard.

Weights can come from the HF Hub (when network + huggingface_hub are
available) or from a local directory laid out as
``{root}/{name}/encoder.safetensors`` (set ``VITOK_PRETRAINED_DIR``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

# Registry: name -> (repo_id, filenames, variant) — mirrors the released
# artifact layout (reference pretrained.py:7-20).
_MODELS: Dict[str, Tuple[str, list, str]] = {
    "350M-f16x16": ("philippehansen/ViTok-v2-350M-f16x16", ["encoder.safetensors", "decoder.safetensors"], "Ld4-Ld24/1x16x16"),
    "350M-f16x32": ("philippehansen/ViTok-v2-350M-f16x32", ["encoder.safetensors", "decoder.safetensors"], "Ld4-Ld24/1x16x32"),
    "350M-f16x64": ("philippehansen/ViTok-v2-350M-f16x64", ["encoder.safetensors", "decoder.safetensors"], "Ld4-Ld24/1x16x64"),
    "5B-f16x16": ("philippehansen/ViTok-v2-5B-f16x16", ["encoder.safetensors", "decoder.safetensors"], "Td4-T/1x16x16"),
    "5B-f16x32": ("philippehansen/ViTok-v2-5B-f16x32", ["encoder.safetensors", "decoder.safetensors"], "Td4-T/1x16x32"),
    "5B-f16x64": ("philippehansen/ViTok-v2-5B-f16x64", ["encoder.safetensors", "decoder.safetensors"], "Td4-T/1x16x64"),
    "5B-f32x64": ("philippehansen/ViTok-v2-5B-f32x64", ["encoder.safetensors", "decoder.safetensors"], "Td4-T/1x32x64"),
    "5B-f32x128": ("philippehansen/ViTok-v2-5B-f32x128", ["encoder.safetensors", "decoder.safetensors"], "Td4-T/1x32x128"),
    "5B-f32x256": ("philippehansen/ViTok-v2-5B-f32x256", ["encoder.safetensors", "decoder.safetensors"], "Td4-T/1x32x256"),
}

PRETRAINED_ALIASES = {name: name for name in _MODELS}


def _resolve_file(name: str, filename: str, cache_dir: Optional[str]) -> str:
    """Find a weight file locally or download it from the HF Hub."""
    local_root = os.environ.get("VITOK_PRETRAINED_DIR")
    if local_root:
        candidate = os.path.join(local_root, name, filename)
        if os.path.exists(candidate):
            return candidate
    repo_id, _, _ = _MODELS[name]
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise RuntimeError(
            f"Weights for {name} not found locally (set VITOK_PRETRAINED_DIR) "
            "and huggingface_hub is unavailable for download"
        ) from e
    return hf_hub_download(repo_id=repo_id, filename=filename, cache_dir=cache_dir)


def load_pretrained(
    name: str,
    component: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> dict:
    """Load raw flat state dicts (reference-compatible return shape).

    Returns ``{"variant": str, "encoder": {...}, "decoder": {...}}`` with
    numpy arrays keyed by flat torch-layout names.
    """
    if name not in _MODELS:
        raise KeyError(f"Unknown model: {name}. Available: {list(_MODELS.keys())}")
    _, filenames, variant = _MODELS[name]
    result: dict = {"variant": variant}

    from safetensors.numpy import load_file

    if component != "decoder":
        result["encoder"] = load_file(_resolve_file(name, filenames[0], cache_dir))
    if component != "encoder":
        result["decoder"] = load_file(_resolve_file(name, filenames[1], cache_dir))
    return result


def load_pretrained_params(
    name: str,
    component: Optional[str] = None,
    cache_dir: Optional[str] = None,
    dtype=np.float32,
):
    """Load a pretrained model as ``(AEConfig, stacked params pytree)``."""
    from vitok_tpu.models.ae import AEConfig
    from vitok_tpu.utils.params_io import torch_state_to_pytree

    raw = load_pretrained(name, component=component, cache_dir=cache_dir)
    cfg = AEConfig.from_variant(
        raw["variant"],
        encoder=component != "decoder",
        decoder=component != "encoder",
    )
    flat = {}
    for part in ("encoder", "decoder"):
        if part in raw:
            flat.update(raw[part])
    params = torch_state_to_pytree(flat, cfg, dtype)
    return cfg, params


def list_pretrained() -> list:
    return list(_MODELS.keys())


def get_pretrained_info(name: str) -> Tuple[str, list, str]:
    if name not in _MODELS:
        raise KeyError(f"Unknown model: {name}. Available: {list(_MODELS.keys())}")
    return _MODELS[name]


def download_pretrained(name: str, cache_dir: Optional[str] = None) -> list:
    if name not in _MODELS:
        raise KeyError(f"Unknown model: {name}. Available: {list(_MODELS.keys())}")
    _, filenames, _ = _MODELS[name]
    return [_resolve_file(name, f, cache_dir) for f in filenames]


__all__ = [
    "load_pretrained",
    "load_pretrained_params",
    "list_pretrained",
    "get_pretrained_info",
    "download_pretrained",
    "PRETRAINED_ALIASES",
]
