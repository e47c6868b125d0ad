"""NaFlex preprocessing ops — factory pattern, host (PIL/numpy) + device (JAX).

Capability parity with reference ``vitok/pp/ops.py`` (Na-VAE/vitok-release),
re-designed for a TPU pipeline:

* host-side ops (resize/crop/augment) stay PIL/numpy — they run in the input
  pipeline, never on device,
* ``patchify`` produces numpy patch dicts with **static** ``max_tokens``
  padding, which maps directly onto XLA's static-shape model,
* ``unpatchify`` is pure JAX: because NaFlex grids are always dense
  rectangles in row-major order, it lowers to reshape/transpose — no scatter
  (the reference needs a scatter hack, ops.py:326-335, which we avoid by
  design),
* ``sample_tiles`` is a jit-friendly gather for perceptual losses.

Every factory ``op(args) -> callable`` so the pp-string DSL composes them.
"""

from __future__ import annotations

import math
import random as _random
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image

    HAS_PIL = True
except ImportError:  # pragma: no cover
    Image = None
    HAS_PIL = False

import jax
import jax.numpy as jnp

Array = jax.Array


# =============================================================================
# Resize ops (PIL -> PIL)
# =============================================================================


def resize_longest_side(max_size: int):
    """Lanczos downscale so the longest side is at most ``max_size``."""

    def _resize(img):
        w, h = img.size
        if max(h, w) <= max_size:
            return img
        scale = max_size / max(h, w)
        new_w, new_h = int(round(w * scale)), int(round(h * scale))
        return img.resize((new_w, new_h), resample=Image.LANCZOS)

    return _resize


def center_crop(size: int):
    """ADM-style center crop: iterated 2x BOX downsample, BICUBIC, crop.

    Same recipe as the reference (ops.py:47-65) / guided-diffusion.
    """

    def _center_crop(img):
        while min(*img.size) >= 2 * size:
            img = img.resize(
                tuple(x // 2 for x in img.size), resample=Image.BOX
            )
        scale = size / min(*img.size)
        img = img.resize(
            tuple(round(x * scale) for x in img.size), resample=Image.BICUBIC
        )
        arr = np.array(img)
        cy = (arr.shape[0] - size) // 2
        cx = (arr.shape[1] - size) // 2
        return Image.fromarray(arr[cy : cy + size, cx : cx + size])

    return _center_crop


def random_resized_crop(
    size: int,
    scale: Tuple[float, float] = (0.8, 1.0),
    ratio: Tuple[float, float] = (0.75, 1.333),
):
    """Random resized crop (ImageNet-style augmentation), Lanczos resample."""

    def _rrc(img):
        w, h = img.size
        area = w * h
        for _ in range(10):
            target_area = area * _random.uniform(*scale)
            log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
            aspect = math.exp(_random.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = _random.randint(0, w - cw)
                y0 = _random.randint(0, h - ch)
                img = img.crop((x0, y0, x0 + cw, y0 + ch))
                return img.resize((size, size), resample=Image.LANCZOS)
        # Fallback: center crop to the limiting aspect then resize.
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw, ch = w, int(round(w / ratio[0]))
        elif in_ratio > ratio[1]:
            cw, ch = int(round(h * ratio[1])), h
        else:
            cw, ch = w, h
        x0, y0 = (w - cw) // 2, (h - ch) // 2
        img = img.crop((x0, y0, x0 + cw, y0 + ch))
        return img.resize((size, size), resample=Image.LANCZOS)

    return _rrc


# =============================================================================
# Augmentation ops (PIL -> PIL)
# =============================================================================


def flip(p: float = 0.5):
    """Random horizontal flip with probability p."""

    def _flip(img):
        if _random.random() < p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img

    return _flip


# =============================================================================
# Composition ops
# =============================================================================


def identity() -> Callable:
    return lambda x: x


def random_choice(ops: Sequence[str], probs: Sequence[float]) -> Callable:
    """Randomly apply one of several op-spec strings (recursively parsed)."""
    if not ops:
        raise ValueError("ops cannot be empty")
    if len(ops) != len(probs):
        raise ValueError(
            f"ops and probs must have same length: {len(ops)} != {len(probs)}"
        )
    from vitok_tpu.pp.registry import parse_op

    resolved = []
    for op in ops:
        name, args, kwargs = parse_op(op)
        resolved.append(OPS[name](*args, **kwargs))

    def _random_choice(x):
        idx = _random.choices(range(len(resolved)), weights=probs, k=1)[0]
        return resolved[idx](x)

    return _random_choice


# =============================================================================
# Conversion ops (PIL -> numpy CHW float32)
# =============================================================================


def to_tensor():
    """PIL image -> float32 numpy array, CHW, range [0, 1]."""

    def _to_tensor(img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return np.ascontiguousarray(arr.transpose(2, 0, 1))

    return _to_tensor


_NORM_STATS = {
    "minus_one_to_one": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "imagenet": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
}


def normalize(mode: str = "minus_one_to_one"):
    """Normalize a [0,1] CHW array. Modes match the reference (ops.py:148-161)."""
    if mode == "zero_to_one":
        return lambda x: x
    if mode not in _NORM_STATS:
        raise ValueError(
            f"Unknown normalize mode: '{mode}'. Use 'minus_one_to_one', "
            "'imagenet', or 'zero_to_one'"
        )
    mean, std = _NORM_STATS[mode]
    mean = np.asarray(mean, np.float32)[:, None, None]
    std = np.asarray(std, np.float32)[:, None, None]
    return lambda x: (x - mean) / std


# =============================================================================
# Token-budget fitting
# =============================================================================


def fit_to_token_budget(
    h: int, w: int, patch: int, max_tokens: int, eps: float = 1e-5
) -> Tuple[int, int]:
    """Largest (h', w') <= (h, w) with ceil(h'/P)*ceil(w'/P) <= max_tokens.

    Closed form, identical semantics to reference ``_fit_to_token_budget``
    (ops.py:169-195).
    """
    h_p = math.ceil(h / patch)
    w_p = math.ceil(w / patch)
    if h_p * w_p <= max_tokens:
        return h, w
    scale = math.sqrt(max_tokens / (h_p * w_p))
    new_h_p = max(1, math.floor(h_p * scale + eps))
    new_w_p = max(1, math.floor(w_p * scale + eps))
    return min(new_h_p * patch, h), min(new_w_p * patch, w)


def _resize_chw_bicubic(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Bicubic resize of a float CHW array via PIL (per-channel, fp32)."""
    c = img.shape[0]
    out = np.empty((c, th, tw), np.float32)
    for i in range(c):
        ch = Image.fromarray(img[i].astype(np.float32), mode="F")
        out[i] = np.asarray(ch.resize((tw, th), resample=Image.BICUBIC))
    return out


def resize_to_token_budget(patch: int, max_tokens: int):
    """Resize a CHW array so its patch grid fits the token budget."""

    def _resize(img: np.ndarray) -> np.ndarray:
        c, h, w = img.shape
        th, tw = fit_to_token_budget(h, w, patch, max_tokens)
        if (th, tw) != (h, w):
            img = _resize_chw_bicubic(img, th, tw)
        return img

    return _resize


# =============================================================================
# Patchify (CHW array -> patch dict)
# =============================================================================


def patchify_array(
    img: np.ndarray, patch: int, max_tokens: int
) -> dict:
    """Patchify one CHW image into a NaFlex patch dict (numpy, host-side).

    Layout matches the reference's ``F.unfold`` row-major patch order with
    per-patch pixels flattened channel-major: dim = C*patch*patch with pixel
    (c, py, px) at index ``c*P*P + py*P + px`` (ops.py:217-285).
    """
    c, h, w = img.shape
    orig_h, orig_w = h, w
    pad_h = (patch - h % patch) % patch
    pad_w = (patch - w % patch) % patch
    if pad_h or pad_w:
        img = np.pad(img, ((0, 0), (0, pad_h), (0, pad_w)))
    hp, wp = img.shape[1], img.shape[2]
    gr, gc = hp // patch, wp // patch
    n = gr * gc
    if n > max_tokens:
        raise ValueError(
            f"Image produces {n} patches > max_tokens={max_tokens}; "
            "compose with resize_to_token_budget first"
        )
    # [C, gr, P, gc, P] -> [gr, gc, C, P, P] -> [N, C*P*P]
    patches = (
        img.reshape(c, gr, patch, gc, patch)
        .transpose(1, 3, 0, 2, 4)
        .reshape(n, c * patch * patch)
    )
    dim = c * patch * patch
    patches_full = np.zeros((max_tokens, dim), np.float32)
    patches_full[:n] = patches
    patch_mask = np.zeros((max_tokens,), bool)
    patch_mask[:n] = True
    yy, xx = np.meshgrid(np.arange(gr), np.arange(gc), indexing="ij")
    row_idx = np.zeros((max_tokens,), np.int32)
    col_idx = np.zeros((max_tokens,), np.int32)
    row_idx[:n] = yy.ravel()
    col_idx[:n] = xx.ravel()
    return {
        "patches": patches_full,
        "patch_mask": patch_mask,
        "row_idx": row_idx,
        "col_idx": col_idx,
        "time_idx": np.zeros((max_tokens,), np.int32),
        "orig_height": np.int32(orig_h),
        "orig_width": np.int32(orig_w),
        "grid_rows": np.int32(gr),
        "grid_cols": np.int32(gc),
    }


def patchify(patch: int = 16, max_tokens: int = 256):
    """Factory: CHW array -> patch dict (no resize; compose with budget op)."""

    def _patchify(img: np.ndarray) -> dict:
        return patchify_array(np.asarray(img, np.float32), patch, max_tokens)

    return _patchify


def patchify_image(
    images: Array, patch: int = 16
) -> dict:
    """Batched jit-friendly patchify for fixed-size device images.

    ``images [B, C, H, W]`` with H, W multiples of ``patch`` -> patch dict
    with N = (H/P)*(W/P) tokens, no padding (all tokens valid). TPU-native
    extra beyond the per-sample host path: pure reshape/transpose under jit.
    """
    b, c, h, w = images.shape
    gr, gc = h // patch, w // patch
    n = gr * gc
    patches = (
        images.reshape(b, c, gr, patch, gc, patch)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(b, n, c * patch * patch)
    )
    yy, xx = jnp.meshgrid(jnp.arange(gr), jnp.arange(gc), indexing="ij")
    tile = lambda a: jnp.tile(a.reshape(1, n), (b, 1)).astype(jnp.int32)
    return {
        "patches": patches,
        "patch_mask": jnp.ones((b, n), bool),
        "row_idx": tile(yy.ravel()),
        "col_idx": tile(xx.ravel()),
        "time_idx": jnp.zeros((b, n), jnp.int32),
        "orig_height": jnp.full((b,), h, jnp.int32),
        "orig_width": jnp.full((b,), w, jnp.int32),
        "grid_rows": jnp.full((b,), gr, jnp.int32),
        "grid_cols": jnp.full((b,), gc, jnp.int32),
    }


# =============================================================================
# Unpatchify (patch dict -> [B, C, H, W])
# =============================================================================


def _unpatchify_dense(
    patches: Array, grid_rows: int, grid_cols: int, patch: int
) -> Array:
    """Reshape-only inverse when valid patches are a dense row-major grid."""
    b = patches.shape[0]
    n = grid_rows * grid_cols
    c = patches.shape[-1] // (patch * patch)
    x = patches[:, :n].reshape(b, grid_rows, grid_cols, c, patch, patch)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, grid_rows * patch, grid_cols * patch)


def unpatchify(
    patch_dict: dict,
    patch: int = 16,
    max_grid_size: Optional[int] = None,
) -> Array:
    """Patch dict -> image tensor ``[B, C, maxY*P, maxX*P]``.

    NaFlex grids are dense rectangles, so per-sample reconstruction is a pure
    reshape; batches mixing grid shapes are handled by scattering each token
    to ``row * max_x + col`` with a jit-safe one-hot-free ``.at[].add``
    (masked-out tokens land in a trash row). Output grid size is inferred
    from the metadata (outside jit) or given via ``max_grid_size``.
    """
    patches = jnp.asarray(patch_dict["patches"])
    mask = jnp.asarray(patch_dict["patch_mask"]).astype(bool)
    row = jnp.asarray(patch_dict["row_idx"]).astype(jnp.int32)
    col = jnp.asarray(patch_dict["col_idx"]).astype(jnp.int32)
    b, n, dim = patches.shape
    c = dim // (patch * patch)

    if max_grid_size is not None:
        max_y = max_x = int(max_grid_size)
    else:
        gr = patch_dict.get("grid_rows")
        gc = patch_dict.get("grid_cols")
        if gr is not None and gc is not None:
            gr_np = np.asarray(jax.device_get(gr)).reshape(-1)
            gc_np = np.asarray(jax.device_get(gc)).reshape(-1)
            max_y, max_x = int(gr_np.max()), int(gc_np.max())
            # Fast path: every sample has the same dense grid covering all
            # valid tokens in row-major order -> reshape, no scatter at all.
            if (gr_np == gr_np[0]).all() and (gc_np == gc_np[0]).all():
                return _unpatchify_dense(
                    jnp.where(mask[..., None], patches, 0.0),
                    int(gr_np[0]), int(gc_np[0]), patch,
                )
        else:
            valid = np.asarray(jax.device_get(mask))
            row_np = np.asarray(jax.device_get(row))
            col_np = np.asarray(jax.device_get(col))
            max_y = int(row_np[valid].max()) + 1
            max_x = int(col_np[valid].max()) + 1

    # General path: scatter-add valid tokens into the flat grid. Masked
    # tokens are redirected to an extra trash cell and dropped afterwards.
    flat_idx = jnp.where(mask, row * max_x + col, max_y * max_x)
    grid = jnp.zeros((b, max_y * max_x + 1, dim), patches.dtype)
    grid = grid.at[jnp.arange(b)[:, None], flat_idx].add(
        jnp.where(mask[..., None], patches, 0.0)
    )
    grid = grid[:, : max_y * max_x]
    x = grid.reshape(b, max_y, max_x, c, patch, patch)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, max_y * patch, max_x * patch)


def unpack(images, orig_h, orig_w) -> List:
    """Crop each image in the batch back to its original size (host-side)."""
    images = jax.device_get(images)
    if images.ndim == 3:
        images = images[None]
    orig_h = np.asarray(jax.device_get(orig_h)).reshape(-1)
    orig_w = np.asarray(jax.device_get(orig_w)).reshape(-1)
    return [
        np.asarray(img[:, : int(h), : int(w)])
        for img, h, w in zip(images, orig_h, orig_w)
    ]


# =============================================================================
# Tile sampling (for perceptual losses) — jit-friendly gather
# =============================================================================


def sample_tile_indices(
    orig_h: Array,
    orig_w: Array,
    n_tiles: int = 2,
    tile_size: Tuple[int, int] = (256, 256),
    rng: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Draw per-image tile origins without touching the images.

    The index half of :func:`sample_tiles`, factored out so callers that
    shard images across devices (the pipelined trainer's stage-local SSIM
    tiles) can draw the indices once at batch level — identical RNG stream
    to single-device ``sample_tiles(images, ..., rng=rng)`` — and apply
    them per-shard via ``sample_tiles(..., indices=...)``.
    """
    b = orig_h.shape[0]
    th, tw = tile_size
    if rng is None:
        rng = jax.random.key(0)
    ry_rng, rx_rng = jax.random.split(rng)
    max_sy = jnp.clip(orig_h.astype(jnp.float32) - th, min=0)
    max_sx = jnp.clip(orig_w.astype(jnp.float32) - tw, min=0)
    r_y = jax.random.uniform(ry_rng, (b, n_tiles))
    r_x = jax.random.uniform(rx_rng, (b, n_tiles))
    start_y = jnp.floor(r_y * (max_sy[:, None] + 1)).astype(jnp.int32)
    start_x = jnp.floor(r_x * (max_sx[:, None] + 1)).astype(jnp.int32)
    return start_y, start_x


def sample_tiles(
    images: Array,
    orig_h: Array,
    orig_w: Array,
    n_tiles: int = 2,
    tile_size: Tuple[int, int] = (256, 256),
    indices: Optional[Tuple[Array, Array]] = None,
    rng: Optional[Array] = None,
) -> Tuple[Array, Tuple[Array, Array]]:
    """Sample random tiles from each image for perceptual losses.

    Deterministic re-sampling on a second tensor is achieved by passing the
    returned ``indices`` (reference ops.py:368-427). Randomness comes from an
    explicit JAX PRNG key (functional; no global state).

    Returns:
        tiles ``[B, n_tiles, C, th, tw]`` and ``(start_y, start_x)``.
    """
    b, c, h, w = images.shape
    th, tw = tile_size
    pad_h, pad_w = max(th - h, 0), max(tw - w, 0)
    if pad_h or pad_w:
        images = jnp.pad(
            images,
            ((0, 0), (0, 0), (0, pad_h), (0, pad_w)),
            constant_values=-1.0,
        )
    ph, pw = images.shape[2], images.shape[3]

    if indices is None:
        start_y, start_x = sample_tile_indices(
            orig_h, orig_w, n_tiles=n_tiles, tile_size=tile_size, rng=rng
        )
    else:
        start_y, start_x = indices

    start_y = jnp.clip(start_y, 0, ph - th)
    start_x = jnp.clip(start_x, 0, pw - tw)

    # Contiguous crops via batched dynamic_slice — orders of magnitude
    # cheaper on TPU than an elementwise advanced-indexing gather.
    def crop_one(img, sy, sx):
        return jax.lax.dynamic_slice(img, (0, sy, sx), (c, th, tw))

    crop_tiles = jax.vmap(  # over tiles
        lambda img, sys_, sxs_: jax.vmap(
            lambda sy, sx: crop_one(img, sy, sx)
        )(sys_, sxs_),
        in_axes=(0, 0, 0),
    )
    tiles = crop_tiles(images, start_y, start_x)  # [B, T, C, th, tw]
    return tiles, (start_y, start_x)


# =============================================================================
# OPS registry
# =============================================================================

OPS = {
    "center_crop": center_crop,
    "random_resized_crop": random_resized_crop,
    "resize_longest_side": resize_longest_side,
    "resize_to_token_budget": resize_to_token_budget,
    "flip": flip,
    "identity": identity,
    "random_choice": random_choice,
    "to_tensor": to_tensor,
    "normalize": normalize,
    "patchify": patchify,
}


__all__ = [
    "center_crop",
    "random_resized_crop",
    "resize_longest_side",
    "resize_to_token_budget",
    "fit_to_token_budget",
    "flip",
    "identity",
    "random_choice",
    "to_tensor",
    "normalize",
    "patchify",
    "patchify_array",
    "patchify_image",
    "unpatchify",
    "unpack",
    "sample_tiles",
    "OPS",
]
