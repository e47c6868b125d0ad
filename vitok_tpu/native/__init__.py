"""Native (C++/OpenMP) host preprocessing with transparent numpy fallback.

``patchify_collate_batch`` is the fused normalize+patchify+collate used by
the data pipeline; it calls the ``_pp_native`` C++ extension when built
(``python -m vitok_tpu.native.build``) and otherwise falls back to the pure
numpy ops in ``vitok_tpu.pp.ops``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_EXT = None
_TRIED = False


def _load_ext():
    global _EXT, _TRIED
    if _TRIED:
        return _EXT
    _TRIED = True
    if os.environ.get("VITOK_DISABLE_NATIVE"):
        return None
    try:
        from vitok_tpu.native import _pp_native  # type: ignore

        _EXT = _pp_native
    except ImportError:
        _EXT = None
    return _EXT


def native_available() -> bool:
    return _load_ext() is not None


_NORM_STATS = {
    "minus_one_to_one": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    "imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "zero_to_one": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
}


def patchify_collate_batch(
    images: Sequence[np.ndarray],
    patch: int = 16,
    max_tokens: int = 256,
    normalize: Optional[str] = "minus_one_to_one",
) -> Dict[str, np.ndarray]:
    """Fused normalize + patchify + collate for a batch of CHW float32 images.

    Semantically identical to per-image ``pp.ops.patchify_array`` (+ optional
    ``normalize``) followed by ``patch_collate_fn`` — one pass, no
    intermediates, OpenMP across images when the native extension is built.
    """
    ext = _load_ext()
    b = len(images)
    if b == 0:
        raise ValueError("empty batch")

    if ext is not None:
        if normalize is None:
            mean, std = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
            do_norm = 0
        else:
            mean, std = _NORM_STATS[normalize]
            do_norm = 0 if normalize == "zero_to_one" else 1
        bufs, shapes = [], []
        for img in images:
            arr = np.ascontiguousarray(img, np.float32)
            bufs.append(arr)
            shapes.append(tuple(int(x) for x in arr.shape))
        p, m, r, c, meta = ext.patchify_collate(
            bufs, shapes, patch, max_tokens, do_norm,
            tuple(float(x) for x in mean), tuple(float(x) for x in std),
        )
        dim = shapes[0][0] * patch * patch
        meta_arr = np.frombuffer(meta, np.int32).reshape(b, 4)
        return {
            "patches": np.frombuffer(p, np.float32).reshape(b, max_tokens, dim),
            "patch_mask": np.frombuffer(m, np.uint8).reshape(b, max_tokens).astype(bool),
            "row_idx": np.frombuffer(r, np.int32).reshape(b, max_tokens),
            "col_idx": np.frombuffer(c, np.int32).reshape(b, max_tokens),
            "time_idx": np.zeros((b, max_tokens), np.int32),
            "orig_height": meta_arr[:, 0].copy(),
            "orig_width": meta_arr[:, 1].copy(),
            "grid_rows": meta_arr[:, 2].copy(),
            "grid_cols": meta_arr[:, 3].copy(),
        }

    # numpy fallback
    from vitok_tpu.pp.io import patch_collate_fn
    from vitok_tpu.pp.ops import patchify_array
    from vitok_tpu.pp.ops import normalize as norm_op

    norm_fn = norm_op(normalize) if normalize else (lambda x: x)
    return patch_collate_fn(
        [
            patchify_array(
                np.asarray(norm_fn(np.asarray(i, np.float32)), np.float32),
                patch, max_tokens,
            )
            for i in images
        ]
    )


__all__ = ["patchify_collate_batch", "native_available"]
