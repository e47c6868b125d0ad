"""NaFlex preprocessing: ops, string DSL, and high-level preprocess/postprocess."""

from vitok_tpu.pp.ops import (
    OPS,
    patchify,
    patchify_array,
    patchify_image,
    unpatchify,
    unpack,
    sample_tiles,
    fit_to_token_budget,
)
from vitok_tpu.pp.registry import build_transform, parse_op
from vitok_tpu.pp.io import preprocess, postprocess

__all__ = [
    "OPS",
    "patchify",
    "patchify_array",
    "patchify_image",
    "unpatchify",
    "unpack",
    "sample_tiles",
    "fit_to_token_budget",
    "build_transform",
    "parse_op",
    "preprocess",
    "postprocess",
]
