"""Pure-JAX InceptionV3 (pytorch_fid's FID variant) for rFID features.

The reference hard-wires ``pytorch_fid.inception.InceptionV3`` pool-2048
features at 299² (``/root/reference/vitok/metrics.py:15,139-146,223-245``).
This module re-implements that network TPU-natively so rFID runs on-device:

* NHWC layout, ``lax.conv_general_dilated`` on the MXU,
* BatchNorm (eps 1e-3) folded into conv weights at load time (inference
  only), so each unit is a single fused conv+bias+relu,
* the FID-specific pooling quirks are reproduced exactly: every in-block
  average pool uses ``count_include_pad=False`` (pytorch_fid's
  FIDInceptionA/C/E_1 patch) and the **last** InceptionE block uses a max
  pool where torchvision has an average pool (FIDInceptionE_2 patch),
* weights load from a pytorch_fid/torchvision-named ``state_dict`` via
  ``torch_inception_state_to_pytree`` (the published FID weights are the
  TF-ported ``pt_inception-2015-12-05`` checkpoint); random init is
  provided for architecture tests.

The network topology lives in a declarative table (``INCEPTION_LAYOUT``)
that the test suite's independent torch mirror also reads, so the two
implementations cannot silently diverge structurally — the mirror validates
stride/padding/count_include_pad/BN semantics numerically with shared
random weights (no pytorch_fid install needed).

Input contract (matching the reference eval loop, metrics.py:223-245):
images resized to 299² bicubic-antialias, clamped to [-1, 1], then mapped
to [0, 1] — fed to the network with no further normalization
(``normalize_input=False`` in the reference's constructor).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict

BN_EPS = 1e-3

# ---------------------------------------------------------------------------
# Declarative topology
# ---------------------------------------------------------------------------
# Each unit: ("conv", name, out_ch, (kh, kw), (sh, sw), (ph, pw)).
# Branch = tuple of units applied sequentially.
# Block = ("block", name, (branch, ...)) — branch outputs concat on channels.
# Pool entries: ("maxpool", (k, s, p)) / ("avgpool_nip", (k, s, p)) where
# _nip = count_include_pad=False (the pytorch_fid patch).

Conv = Tuple[str, str, int, Tuple[int, int], Tuple[int, int], Tuple[int, int]]


def _c(name: str, out: int, k, s=1, p=0) -> Conv:
    k = (k, k) if isinstance(k, int) else k
    s = (s, s) if isinstance(s, int) else s
    p = (p, p) if isinstance(p, int) else p
    return ("conv", name, out, k, s, p)


def _inception_a(pool_features: int):
    return (
        (_c("branch1x1", 64, 1),),
        (_c("branch5x5_1", 48, 1), _c("branch5x5_2", 64, 5, 1, 2)),
        (
            _c("branch3x3dbl_1", 64, 1),
            _c("branch3x3dbl_2", 96, 3, 1, 1),
            _c("branch3x3dbl_3", 96, 3, 1, 1),
        ),
        (("avgpool_nip", (3, 1, 1)), _c("branch_pool", pool_features, 1)),
    )


def _inception_b():
    return (
        (_c("branch3x3", 384, 3, 2, 0),),
        (
            _c("branch3x3dbl_1", 64, 1),
            _c("branch3x3dbl_2", 96, 3, 1, 1),
            _c("branch3x3dbl_3", 96, 3, 2, 0),
        ),
        (("maxpool", (3, 2, 0)),),
    )


def _inception_c(c7: int):
    return (
        (_c("branch1x1", 192, 1),),
        (
            _c("branch7x7_1", c7, 1),
            _c("branch7x7_2", c7, (1, 7), 1, (0, 3)),
            _c("branch7x7_3", 192, (7, 1), 1, (3, 0)),
        ),
        (
            _c("branch7x7dbl_1", c7, 1),
            _c("branch7x7dbl_2", c7, (7, 1), 1, (3, 0)),
            _c("branch7x7dbl_3", c7, (1, 7), 1, (0, 3)),
            _c("branch7x7dbl_4", c7, (7, 1), 1, (3, 0)),
            _c("branch7x7dbl_5", 192, (1, 7), 1, (0, 3)),
        ),
        (("avgpool_nip", (3, 1, 1)), _c("branch_pool", 192, 1)),
    )


def _inception_d():
    return (
        (_c("branch3x3_1", 192, 1), _c("branch3x3_2", 320, 3, 2, 0)),
        (
            _c("branch7x7x3_1", 192, 1),
            _c("branch7x7x3_2", 192, (1, 7), 1, (0, 3)),
            _c("branch7x7x3_3", 192, (7, 1), 1, (3, 0)),
            _c("branch7x7x3_4", 192, 3, 2, 0),
        ),
        (("maxpool", (3, 2, 0)),),
    )


def _inception_e(last: bool):
    # torchvision InceptionE has a *forking* 3x3 branch; expressed as a
    # stem + two parallel tails concatenated.
    pool = ("maxpool", (3, 1, 1)) if last else ("avgpool_nip", (3, 1, 1))
    return (
        (_c("branch1x1", 320, 1),),
        (
            _c("branch3x3_1", 384, 1),
            (
                "fork",
                (_c("branch3x3_2a", 384, (1, 3), 1, (0, 1)),),
                (_c("branch3x3_2b", 384, (3, 1), 1, (1, 0)),),
            ),
        ),
        (
            _c("branch3x3dbl_1", 448, 1),
            _c("branch3x3dbl_2", 384, 3, 1, 1),
            (
                "fork",
                (_c("branch3x3dbl_3a", 384, (1, 3), 1, (0, 1)),),
                (_c("branch3x3dbl_3b", 384, (3, 1), 1, (1, 0)),),
            ),
        ),
        (pool, _c("branch_pool", 192, 1)),
    )


# (kind, name, payload); kinds: "conv" (stem BasicConv2d), "maxpool",
# "block" (inception module).
INCEPTION_LAYOUT: List[Tuple] = [
    ("conv", "Conv2d_1a_3x3", _c("", 32, 3, 2, 0)),
    ("conv", "Conv2d_2a_3x3", _c("", 32, 3, 1, 0)),
    ("conv", "Conv2d_2b_3x3", _c("", 64, 3, 1, 1)),
    ("maxpool", "", (3, 2, 0)),
    ("conv", "Conv2d_3b_1x1", _c("", 80, 1, 1, 0)),
    ("conv", "Conv2d_4a_3x3", _c("", 192, 3, 1, 0)),
    ("maxpool", "", (3, 2, 0)),
    ("block", "Mixed_5b", _inception_a(32)),
    ("block", "Mixed_5c", _inception_a(64)),
    ("block", "Mixed_5d", _inception_a(64)),
    ("block", "Mixed_6a", _inception_b()),
    ("block", "Mixed_6b", _inception_c(128)),
    ("block", "Mixed_6c", _inception_c(160)),
    ("block", "Mixed_6d", _inception_c(160)),
    ("block", "Mixed_6e", _inception_c(192)),
    ("block", "Mixed_7a", _inception_d()),
    ("block", "Mixed_7b", _inception_e(last=False)),
    ("block", "Mixed_7c", _inception_e(last=True)),
]

POOL_DIM = 2048


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _iter_convs() -> List[Tuple[str, Conv]]:
    """Flat (param_name, conv_spec) traversal in layout order."""
    out = []
    for kind, name, payload in INCEPTION_LAYOUT:
        if kind == "conv":
            out.append((name, payload))
        elif kind == "block":
            for branch in payload:
                for unit in branch:
                    if unit[0] == "conv":
                        out.append((f"{name}.{unit[1]}", unit))
                    elif unit[0] == "fork":
                        for tail in unit[1:]:
                            for u in tail:
                                out.append((f"{name}.{u[1]}", u))
    return out


def init_inception_params(key: Array, dtype=jnp.float32) -> Params:
    """Random init (architecture tests / smoke runs — NOT FID-comparable)."""
    params: Params = {}
    chans = _infer_in_channels()
    names = _iter_convs()
    keys = jax.random.split(key, len(names))
    for (pname, spec), k in zip(names, keys):
        _, _, out_ch, (kh, kw), _, _ = spec
        cin = chans[pname]
        w = jax.random.normal(k, (kh, kw, cin, out_ch), jnp.float32) * (
            1.0 / np.sqrt(kh * kw * cin)
        )
        params[pname] = {
            "w": w.astype(dtype),
            "b": jnp.zeros((out_ch,), dtype),
        }
    return params


def _infer_in_channels() -> Dict[str, int]:
    """Input channel count of every conv, derived from the layout table."""
    chans: Dict[str, int] = {}
    c = 3
    for kind, name, payload in INCEPTION_LAYOUT:
        if kind == "conv":
            chans[name] = c
            c = payload[2]
        elif kind == "maxpool":
            continue
        elif kind == "block":
            out_total = 0
            for branch in payload:
                bc = c
                for unit in branch:
                    if unit[0] == "conv":
                        chans[f"{name}.{unit[1]}"] = bc
                        bc = unit[2]
                    elif unit[0] == "fork":
                        fork_out = 0
                        for tail in unit[1:]:
                            tc = bc
                            for u in tail:
                                chans[f"{name}.{u[1]}"] = tc
                                tc = u[2]
                            fork_out += tc
                        bc = fork_out
                    # pools keep channel count
                out_total += bc
            c = out_total
    return chans


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _conv(x: Array, p: Params, spec: Conv) -> Array:
    _, _, _, (kh, kw), (sh, sw), (ph, pw) = spec
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _maxpool(x: Array, k: int, s: int, p: int) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, k, k, 1), (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0)),
    )


def _avgpool_nip(x: Array, k: int, s: int, p: int) -> Array:
    """Average pool, count_include_pad=False (the pytorch_fid patch)."""
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, k, k, 1), (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0)),
    )
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, k, k, 1), (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0)),
    )
    return (summed / counts).astype(x.dtype)


def _apply_unit(x: Array, params: Params, prefix: str, unit) -> Array:
    if unit[0] == "conv":
        name = f"{prefix}.{unit[1]}" if prefix else unit[1]
        return _conv(x, params[name], unit)
    if unit[0] == "maxpool":
        return _maxpool(x, *unit[1])
    if unit[0] == "avgpool_nip":
        return _avgpool_nip(x, *unit[1])
    if unit[0] == "fork":
        outs = []
        for tail in unit[1:]:
            y = x
            for u in tail:
                y = _apply_unit(y, params, prefix, u)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)
    raise ValueError(unit[0])


def inception_apply(
    params: Params, images: Array, compute_dtype=jnp.float32
) -> Array:
    """``[B, 3, 299, 299]`` in [0, 1] -> pool-2048 features ``[B, 2048]``.

    Matches the reference feed: images are passed through unchanged
    (``normalize_input=False``) — callers resize/clamp/rescale beforehand.
    """
    x = images.astype(compute_dtype).transpose(0, 2, 3, 1)  # NHWC
    for kind, name, payload in INCEPTION_LAYOUT:
        if kind == "conv":
            x = _conv(x, params[name], payload)
        elif kind == "maxpool":
            x = _maxpool(x, *payload)
        elif kind == "block":
            outs = []
            for branch in payload:
                y = x
                for unit in branch:
                    y = _apply_unit(y, params, name, unit)
                outs.append(y)
            x = jnp.concatenate(outs, axis=-1)
    # global average pool (adaptive 1x1)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


# ---------------------------------------------------------------------------
# torch state-dict interchange (BN folded)
# ---------------------------------------------------------------------------


def torch_inception_state_to_pytree(state: Dict) -> Params:
    """pytorch_fid/torchvision ``state_dict`` -> folded-conv pytree.

    Accepts names like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}`` (torch tensors or
    numpy arrays). BN (eps 1e-3) folds into each conv's weight + bias.
    """

    def get(name):
        t = state[name]
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            np.float64,
        )

    params: Params = {}
    for pname, spec in _iter_convs():
        w = get(f"{pname}.conv.weight")  # [O, I, kh, kw]
        gamma = get(f"{pname}.bn.weight")
        beta = get(f"{pname}.bn.bias")
        mean = get(f"{pname}.bn.running_mean")
        var = get(f"{pname}.bn.running_var")
        scale = gamma / np.sqrt(var + BN_EPS)
        w_folded = w * scale[:, None, None, None]
        b_folded = beta - mean * scale
        params[pname] = {
            # torch [O, I, kh, kw] -> HWIO
            "w": jnp.asarray(
                w_folded.transpose(2, 3, 1, 0), jnp.float32
            ),
            "b": jnp.asarray(b_folded, jnp.float32),
        }
    return params


def load_inception(weights: str | None = None) -> Tuple[Params, Callable]:
    """FID-Inception params + jitted feature fn.

    ``weights``: path to a ``pt_inception-2015-12-05``-style state dict
    (``.pth``) or ``.safetensors``; ``None`` random-inits (architecture
    smoke only — NOT comparable to published rFID numbers).
    """
    if weights is None:
        import warnings

        warnings.warn(
            "FID-Inception weights not provided; using random init. "
            "rFID values will NOT be comparable to published numbers.",
            stacklevel=2,
        )
        params = init_inception_params(jax.random.key(0))
    elif weights.endswith(".safetensors"):
        from safetensors.numpy import load_file

        params = torch_inception_state_to_pytree(load_file(weights))
    else:
        import torch

        state = torch.load(weights, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        params = torch_inception_state_to_pytree(state)

    fn = jax.jit(lambda imgs: inception_apply(params, imgs))
    return params, fn


__all__ = [
    "INCEPTION_LAYOUT",
    "POOL_DIM",
    "init_inception_params",
    "inception_apply",
    "torch_inception_state_to_pytree",
    "load_inception",
]
