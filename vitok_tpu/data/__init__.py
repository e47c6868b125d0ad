"""Host-side data pipeline feeding the TPU step."""

from vitok_tpu.data.loaders import (
    HF_DATASETS,
    PrefetchingLoader,
    brace_expand,
    create_dataloader,
    iter_tar_samples,
    patch_collate_fn,
    resolve_source,
    to_rgb,
)

__all__ = [
    "HF_DATASETS",
    "PrefetchingLoader",
    "brace_expand",
    "create_dataloader",
    "iter_tar_samples",
    "patch_collate_fn",
    "resolve_source",
    "to_rgb",
]
