"""vitok_tpu: TPU-native ViTok-v2 — NaFlex ViT image tokenizer on JAX/XLA/Pallas.

Public API surface mirrors the reference package (``vitok/__init__.py:3-28``
in Na-VAE/vitok-release) so reference users can switch with minimal changes.
"""

from vitok_tpu.models.ae import AE, AEConfig, Model, decode_variant

__version__ = "0.1.0"

# Lazy re-exports keep `import vitok_tpu` light (no PIL/torch pulled in until
# the pp / data / pretrained layers are actually used).
_LAZY = {
    "build_transform": "vitok_tpu.pp.registry",
    "OPS": "vitok_tpu.pp.ops",
    "preprocess": "vitok_tpu.pp.io",
    "postprocess": "vitok_tpu.pp.io",
    "unpatchify": "vitok_tpu.pp.ops",
    "unpack": "vitok_tpu.pp.ops",
    "patchify_image": "vitok_tpu.pp.ops",
    "create_dataloader": "vitok_tpu.data.loaders",
    "patch_collate_fn": "vitok_tpu.pp.io",
    "load_pretrained": "vitok_tpu.pretrained",
    "load_pretrained_params": "vitok_tpu.pretrained",
    "list_pretrained": "vitok_tpu.pretrained",
    "get_pretrained_info": "vitok_tpu.pretrained",
    "download_pretrained": "vitok_tpu.pretrained",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'vitok_tpu' has no attribute {name!r}")


__all__ = [
    "AE",
    "AEConfig",
    "Model",
    "decode_variant",
    *sorted(_LAZY),
]
