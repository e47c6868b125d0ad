"""Checkpoint interchange: reference flat state-dicts <-> stacked pytrees.

The released ViTok-v2 checkpoints are safetensors files with flat torch
module names (``encoder_blocks.N.attn.qkv_proj.weight`` etc. — layout
documented by reference ``pretrained.py:7-20`` and the key remapping in
``tests/gpu/test_v2_comparison.py:39-72``). Our TPU-native params are stacked
per-depth pytrees (scan layout), with Linear kernels input-major
(``y = x @ kernel``, i.e. the transpose of torch's ``weight``).

This module converts both ways so released HF checkpoints load bit-exactly
and our checkpoints can be exported back for torch users.

One deliberate re-ordering: q/k projection output channels (and the
per-channel QK-norm scales) are permuted from the reference's interleaved
RoPE layout to rotate-half order (``ops.rope.rope_half_permutation``) on
import, and back on export. Attention is exactly invariant to the
permutation; it lets the model rotate q/k with two contiguous half-slices
instead of TPU-hostile lane deinterleaves.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from vitok_tpu.models.ae import AEConfig

Params = Dict[str, Any]

# (torch suffix, pytree path within a block, transpose?)
_BLOCK_ENTRIES = [
    ("norm1.weight", ("norm1", "scale"), False),
    ("attn.qkv_proj.weight", ("attn", "qkv", "kernel"), True),
    ("attn.out_proj.weight", ("attn", "out", "kernel"), True),
    ("attn.norm_q.weight", ("attn", "norm_q", "scale"), False),
    ("attn.norm_k.weight", ("attn", "norm_k", "scale"), False),
    ("ffn.fc1.weight", ("ffn", "fc1", "kernel"), True),
    ("ffn.fc2.weight", ("ffn", "fc2", "kernel"), True),
    ("layer_scale.gamma", ("layer_scale", "gamma"), False),
]

_TOP_LINEAR = {
    "patch_embed": "patch_embed",
    "to_code": "to_code",
    "decoder_embed": "decoder_embed",
    "to_pixels": "to_pixels",
}


def _strip_prefix(key: str) -> str:
    if key.startswith("_orig_mod."):
        return key[len("_orig_mod."):]
    return key


def _set_path(tree: Params, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree: Params, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu()
        if v.dtype.__str__() == "torch.bfloat16":
            v = v.float()
        return v.numpy()
    return np.asarray(v)


def _qk_rope_perm(head_dim: int, inverse: bool = False) -> np.ndarray:
    from vitok_tpu.ops.rope import rope_half_permutation

    perm = rope_half_permutation(head_dim)
    return np.argsort(perm) if inverse else perm


def _permute_qkv_kernel(arr: np.ndarray, head_dim: int, inverse: bool) -> np.ndarray:
    """Permute q/k output channels of a stacked qkv kernel [..., in, 3W]."""
    *lead, fan_in, out = arr.shape
    width = out // 3
    heads = width // head_dim
    perm = _qk_rope_perm(head_dim, inverse)
    a = arr.reshape(*lead, fan_in, 3, heads, head_dim)
    qk = np.take(a[..., :2, :, :], perm, axis=-1)
    return np.concatenate([qk, a[..., 2:, :, :]], axis=-3).reshape(arr.shape)


def _permute_qk_scale(arr: np.ndarray, inverse: bool) -> np.ndarray:
    """Permute a stacked per-channel QK-norm scale [..., head_dim]."""
    return np.take(arr, _qk_rope_perm(arr.shape[-1], inverse), axis=-1)


def torch_state_to_pytree(
    state: Mapping[str, Any],
    cfg: Optional[AEConfig] = None,
    dtype=np.float32,
) -> Params:
    """Convert a flat reference state-dict to our stacked params pytree.

    ``state`` maps flat names to arrays (torch tensors or numpy). Depth is
    inferred from the keys, so a config is optional (used only for
    validation when given).
    """
    state = { _strip_prefix(k): v for k, v in state.items() }
    params: Params = {}

    for torch_name, tree_name in _TOP_LINEAR.items():
        wk, bk = f"{torch_name}.weight", f"{torch_name}.bias"
        if wk in state:
            entry: Params = {"kernel": _to_numpy(state[wk]).T.astype(dtype)}
            if bk in state:
                entry["bias"] = _to_numpy(state[bk]).astype(dtype)
            params[tree_name] = entry

    for stack_name in ("encoder_blocks", "decoder_blocks"):
        depths = set()
        for k in state:
            if k.startswith(stack_name + "."):
                depths.add(int(k.split(".")[1]))
        if not depths:
            continue
        depth = max(depths) + 1
        if cfg is not None:
            expected = cfg.encoder_depth if stack_name == "encoder_blocks" else cfg.decoder_depth
            if depth != expected:
                raise ValueError(
                    f"{stack_name}: checkpoint depth {depth} != config {expected}"
                )
        stack: Params = {}
        for suffix, path, transpose in _BLOCK_ENTRIES:
            key0 = f"{stack_name}.0.{suffix}"
            if key0 not in state:
                continue  # e.g. no layer_scale in this checkpoint
            layers = []
            for i in range(depth):
                arr = _to_numpy(state[f"{stack_name}.{i}.{suffix}"])
                if transpose:
                    arr = arr.T
                layers.append(arr.astype(dtype))
            _set_path(stack, path, np.stack(layers))
        # Interleaved -> rotate-half q/k channel order (see module docstring).
        attn = stack.get("attn", {})
        if "norm_q" in attn and "qkv" in attn:
            hd = attn["norm_q"]["scale"].shape[-1]
            attn["qkv"]["kernel"] = _permute_qkv_kernel(
                attn["qkv"]["kernel"], hd, inverse=False
            )
            for nm in ("norm_q", "norm_k"):
                attn[nm]["scale"] = _permute_qk_scale(
                    attn[nm]["scale"], inverse=False
                )
        params[stack_name] = stack

    if not params:
        raise ValueError("No recognizable ViTok keys found in state dict")
    return params


def pytree_to_torch_state(params: Params) -> Dict[str, np.ndarray]:
    """Convert our stacked pytree back to the reference flat layout (numpy)."""
    state: Dict[str, np.ndarray] = {}

    for torch_name, tree_name in _TOP_LINEAR.items():
        if tree_name in params:
            entry = params[tree_name]
            state[f"{torch_name}.weight"] = np.asarray(entry["kernel"]).T
            if "bias" in entry:
                state[f"{torch_name}.bias"] = np.asarray(entry["bias"])

    for stack_name in ("encoder_blocks", "decoder_blocks"):
        if stack_name not in params:
            continue
        stack = params[stack_name]
        attn = stack.get("attn", {})
        hd = (
            np.asarray(attn["norm_q"]["scale"]).shape[-1]
            if "norm_q" in attn and "qkv" in attn
            else None
        )
        for suffix, path, transpose in _BLOCK_ENTRIES:
            try:
                arr = np.asarray(_get_path(stack, path))
            except KeyError:
                continue
            # Rotate-half -> reference interleaved q/k channel order.
            if hd is not None:
                if path == ("attn", "qkv", "kernel"):
                    arr = _permute_qkv_kernel(arr, hd, inverse=True)
                elif path in (("attn", "norm_q", "scale"), ("attn", "norm_k", "scale")):
                    arr = _permute_qk_scale(arr, inverse=True)
            for i in range(arr.shape[0]):
                layer = arr[i].T if transpose else arr[i]
                state[f"{stack_name}.{i}.{suffix}"] = layer
    return state


def load_safetensors_params(
    paths: Mapping[str, str] | str,
    cfg: Optional[AEConfig] = None,
    dtype=np.float32,
) -> Params:
    """Load params from safetensors file(s).

    ``paths`` may be a single file (full model) or a mapping like
    ``{"encoder": enc_path, "decoder": dec_path}`` matching the released
    split-artifact layout (encoder.safetensors / decoder.safetensors).
    """
    from safetensors.numpy import load_file

    if isinstance(paths, str):
        flat = load_file(paths)
    else:
        flat = {}
        for part in paths.values():
            flat.update(load_file(part))
    return torch_state_to_pytree(flat, cfg, dtype)


def save_safetensors_params(params: Params, path: str, component: Optional[str] = None) -> None:
    """Export params to a safetensors file in the reference flat layout.

    ``component`` of "encoder"/"decoder" restricts export to that half
    (matching the released split artifacts).
    """
    from safetensors.numpy import save_file

    state = pytree_to_torch_state(params)
    if component == "encoder":
        keep = ("patch_embed", "to_code", "encoder_blocks")
        state = {k: v for k, v in state.items() if k.startswith(keep)}
    elif component == "decoder":
        keep = ("decoder_embed", "to_pixels", "decoder_blocks")
        state = {k: v for k, v in state.items() if k.startswith(keep)}
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)


__all__ = [
    "torch_state_to_pytree",
    "pytree_to_torch_state",
    "load_safetensors_params",
    "save_safetensors_params",
]
