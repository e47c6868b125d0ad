"""Int8 quantized inference path (dynamic activation × int8 weight).

The TPU-native replacement for the reference's torchao FP8 dynamic-activation
/ FP8-weight quantization (``vitok/models/ae.py:253-270`` in
Na-VAE/vitok-release). v5e has no FP8 MXU mode; its int8 path runs at 2× the
bf16 rate, so we use AQT-style int8×int8:

* weights: per-output-channel symmetric int8 (absmax / 127),
* activations: per-token dynamic symmetric int8 computed on the fly,
* the matmul accumulates in int32 on the MXU, then rescales in fp32.

Quality is gated the same way the reference gates FP8/INT8
(SSIM >= 0.99 vs bf16 — tests/gpu/test_float8_inference.py:350-355).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
Params = Dict[str, Any]

# Linears quantized inside each transformer block (embeds/heads stay bf16 —
# same scope as the reference, which quantizes blocks only, ae.py:261-267).
_QUANT_KEYS = ("qkv", "out", "fc1", "fc2")


def quantize_weight(kernel: Array, offload: bool = False) -> Dict[str, Array]:
    """Per-output-channel symmetric int8 quantization of ``[..., in, out]``.

    ``offload=True`` quantizes via host numpy — avoids the fp32 transient on
    device, which matters for 5B-scale stacked kernels on a 16GB chip.
    """
    if offload:
        import numpy as np

        k32 = np.asarray(jax.device_get(kernel), np.float32)
        absmax = np.abs(k32).max(axis=-2, keepdims=True)
        scale = np.maximum(absmax / 127.0, 1e-12)
        q = np.clip(np.round(k32 / scale), -127, 127).astype(np.int8)
        if hasattr(kernel, "delete"):
            kernel.delete()
        return {
            "kernel_int8": jnp.asarray(q),
            "scale": jnp.asarray(scale.squeeze(-2).astype(np.float32)),
        }
    k32 = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k32), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return {"kernel_int8": q, "scale": scale.squeeze(-2).astype(jnp.float32)}


def quantize_activation(x: Array):
    """Per-token dynamic symmetric int8: ``x -> (x_int8, scale)``."""
    x32 = x.astype(jnp.float32)
    a_absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    a_scale = jnp.maximum(a_absmax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    return xq, a_scale


def int8_matmul_prequant(
    xq: Array, a_scale: Array, qp: Dict[str, Array], out_dtype
) -> Array:
    """int8 × int8 matmul with pre-quantized activations (int32 MXU acc)."""
    acc = jax.lax.dot_general(
        xq,
        qp["kernel_int8"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * a_scale * qp["scale"]
    return out.astype(out_dtype)


def int8_linear(x: Array, qp: Dict[str, Array]) -> Array:
    """Dynamic per-token int8 activation × int8 weight matmul.

    x: ``[..., in]`` (bf16/fp32); qp: {"kernel_int8": [in, out], "scale": [out]}.
    Returns ``[..., out]`` in x.dtype.
    """
    xq, a_scale = quantize_activation(x)
    return int8_matmul_prequant(xq, a_scale, qp, x.dtype)


def pad_ffn_dim(f: int) -> int:
    """Next 128-lane-aligned hidden dim (``8208 -> 8320``)."""
    return ((f + 127) // 128) * 128


def pad_fc1_kernel(kernel: Array) -> Array:
    """Pad BOTH SwiGLU halves of an fc1 kernel to 128-aligned columns.

    ``[..., C, 2F] -> [..., C, 2F']`` with ``F' = pad_ffn_dim(F)``; layout
    stays ``[v(0..F'-1) | g(F'..2F'-1)]`` with zero columns appended to each
    half. Exactness: the pad columns produce ``silu(0) * 0 = 0`` activations,
    and the generic SwiGLU consumer (``jnp.split(hid, 2)``) splits at the
    padded midpoint so v/g stay correctly paired. Enables the fused FFN
    kernel's 128-lane column tiling (the reference hidden dims — e.g. 8208
    for T-width — are 16-aligned only).
    """
    f = kernel.shape[-1] // 2
    fp = pad_ffn_dim(f)
    if fp == f:
        return kernel
    v, g = kernel[..., :f], kernel[..., f:]
    pad = [(0, 0)] * (kernel.ndim - 1) + [(0, fp - f)]
    return jnp.concatenate([jnp.pad(v, pad), jnp.pad(g, pad)], axis=-1)


def pad_fc2_kernel(kernel: Array) -> Array:
    """Zero-pad fc2 input rows ``[..., F, out] -> [..., F', out]`` to match
    ``pad_fc1_kernel``'s activation width (zero rows contribute nothing)."""
    f = kernel.shape[-2]
    fp = pad_ffn_dim(f)
    if fp == f:
        return kernel
    pad = [(0, 0)] * kernel.ndim
    pad[-2] = (0, fp - f)
    return jnp.pad(kernel, pad)


def _ffn_int8_kernel(
    hq_ref,    # [MT, C] int8 — quantized block input (token rows)
    hs_ref,    # [MT, 1] f32 — per-token activation scales
    wv_ref,    # [C, BW] int8 — fc1 value-half column block p
    wg_ref,    # [C, BW] int8 — fc1 gate-half column block p
    sv_ref,    # [1, BW] f32 — per-channel weight scales (value cols)
    sg_ref,    # [1, BW] f32 — (gate cols)
    q_ref,     # [MT, BW] int8 out — quantized silu(g)*v block p
    ts_ref,    # [MT, 1] f32 out — per-token output scales
    t_scr,     # VMEM [MT, F'] bf16 — full-row silu(g)*v staging
    amax_scr,  # VMEM [MT, 128] f32 — running per-token absmax (lane-bcast)
    *,
    bw: int,
):
    """Two-phase fused fc1-GEMM + SwiGLU + dynamic per-token int8 requant.

    Grid ``(M/MT, 2, F'/BW)``: phase ``j=0`` runs the int8 GEMM for one
    BW-column block of each SwiGLU half on the MXU, dequantizes, applies
    silu(g)*v in f32, stages the bf16 result in VMEM scratch and folds the
    block absmax into a running per-token max. Phase ``j=1`` re-reads the
    staged rows with the now-complete per-token scale and writes int8 —
    EXACT per-token dynamic quantization without the [M, 2F] bf16 HBM
    round-trip of the unfused fc1-GEMM -> fused_silu_quant chain. BW is
    the widest 128-multiple block that divides F' (fewer, larger grid
    steps keep the MXU fed — 128-wide blocks measured +0.9 ms at the 5B
    shape from per-step overhead alone).
    """
    p = pl.program_id(2)

    @pl.when(pl.program_id(1) == 0)
    def _compute():
        x = hq_ref[:, :]
        dims = (((1,), (0,)), ((), ()))
        accv = jax.lax.dot_general(
            x, wv_ref[:, :], dims, preferred_element_type=jnp.int32
        )
        accg = jax.lax.dot_general(
            x, wg_ref[:, :], dims, preferred_element_type=jnp.int32
        )
        xs = hs_ref[:, :]  # [MT, 1] f32
        v = accv.astype(jnp.float32) * xs * sv_ref[:, :]
        g = accg.astype(jnp.float32) * xs * sg_ref[:, :]
        t = jax.nn.silu(g) * v  # f32 gate math (see _silu_quant_kernel)
        t_scr[:, pl.ds(p * bw, bw)] = t.astype(t_scr.dtype)
        bm = jnp.broadcast_to(
            jnp.max(jnp.abs(t), axis=-1, keepdims=True), amax_scr.shape
        )
        amax_scr[:, :] = jnp.where(
            p == 0, bm, jnp.maximum(amax_scr[:, :], bm)
        )

    @pl.when(pl.program_id(1) == 1)
    def _quantize():
        scale = jnp.maximum(amax_scr[:, :1] / 127.0, 1e-12)  # [MT, 1]
        rcp = 1.0 / scale  # one divide per row, multiplies per element
        t = t_scr[:, pl.ds(p * bw, bw)].astype(jnp.float32)
        q_ref[:, :] = jnp.clip(
            jnp.round(t * rcp), -127, 127
        ).astype(jnp.int8)

        @pl.when(p == 0)
        def _():
            ts_ref[:, :] = scale


def _ffn_shapes_fusable(m: int, c: int, f2: int) -> bool:
    fp = f2 // 2
    return (
        f2 % 256 == 0
        and fp % 128 == 0
        and c % 128 == 0
        and m % 8 == 0
    )


def can_fuse_ffn(m: int, c: int, f2: int) -> bool:
    """Gate for ``fused_ffn_int8``: TPU backend, 128-aligned shapes, and a
    token count that tiles into >= 8-row programs.

    ``VITOK_DISABLE_FUSED_FFN=1`` forces the unfused chain (A/B harness).
    """
    import os

    if os.environ.get("VITOK_DISABLE_FUSED_FFN"):
        return False
    if not can_fuse_silu_quant(8):  # backend check only (8 % 8 == 0)
        return False
    return _ffn_shapes_fusable(m, c, f2)


def fused_ffn_int8(hq: Array, h_scale: Array, fc1: Dict[str, Array],
                   interpret: bool = False):
    """Fused int8 fc1 GEMM + SwiGLU + per-token int8 requantization (Pallas).

    Replaces ``int8_matmul_prequant(hq, h_scale, fc1) -> fused_silu_quant``:
    the unfused chain writes the ``[M, 2F]`` bf16 hidden to HBM and reads it
    straight back (~1.1 GB per 5B decoder block at batch 64 / 256 tokens —
    measured ~1.8 ms of the 5.45 ms fc1+silu path in the round-4 xplane
    trace). This kernel keeps each token row's SwiGLU output resident in a
    VMEM scratch between the GEMM phase and the quantize phase, so the
    hidden activation never touches HBM. Weights must be padded to
    128-aligned halves first (``pad_fc1_kernel`` — done by
    ``quantize_block_params*``).

    Args:
        hq: ``[M, C]`` int8 pre-quantized activations (flatten [B, N, C]).
        h_scale: ``[M, 1]`` f32 per-token activation scales.
        fc1: ``{"kernel_int8": [C, 2F'], "scale": [2F']}`` padded layout.

    Returns:
        ``(tq [M, F'] int8, t_scale [M, 1] f32)`` — drop-in inputs for the
        fc2 ``int8_matmul_prequant``.
    """
    w = fc1["kernel_int8"]
    ws = fc1["scale"]
    m, c = hq.shape
    f2 = w.shape[-1]
    fp = f2 // 2
    assert _ffn_shapes_fusable(m, c, f2), (m, c, f2)

    # Column block width: the widest 128-multiple divisor of F' whose
    # double-buffered weight blocks stay under ~12 MB. Wide blocks keep
    # the MXU fed (128-wide measured +0.9 ms at the 5B shape).
    bw = max(
        b for b in range(128, fp + 1, 128)
        if fp % b == 0 and 4 * c * b <= 12 * 1024 * 1024
    )
    nb = fp // bw

    # Largest row tile that divides M with the full-row bf16 scratch plus
    # buffered blocks under the raised Mosaic VMEM budget (v5e: 128 MB
    # physical; default scoped limit is 16 MB — overridden below).
    def _vmem(mt):
        return (
            2 * mt * fp            # bf16 scratch
            + 2 * mt * c           # int8 input (double-buffered)
            + 2 * 2 * c * bw       # two int8 weight halves, double-buffered
            + 2 * mt * bw          # int8 out block, double-buffered
            + mt * (128 + 2) * 4   # amax scratch + token scales
        )

    mt = next(
        t for t in (1024, 512, 256, 128, 64, 32, 16, 8)
        if m % t == 0 and _vmem(t) <= 48 * 1024 * 1024
    )

    grid = (m // mt, 2, nb)
    # Weight/scale column blocks freeze at block 0 during the quantize
    # phase (j=1) so no fresh DMAs are issued while scratch drains.
    vcol = lambda i, j, p: (0, p * (1 - j))
    gcol = lambda i, j, p, _nb=nb: (0, _nb + p * (1 - j))

    q, ts = pl.pallas_call(
        functools.partial(_ffn_int8_kernel, bw=bw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mt, c), lambda i, j, p: (i, 0)),
            pl.BlockSpec((mt, 1), lambda i, j, p: (i, 0)),
            pl.BlockSpec((c, bw), vcol),
            pl.BlockSpec((c, bw), gcol),
            pl.BlockSpec((1, bw), vcol),
            pl.BlockSpec((1, bw), gcol),
        ],
        out_specs=(
            # Constant block (i, 0) through the GEMM phase, then walks the
            # column blocks during j=1 — every flush happens after its
            # block was written (no garbage writes).
            pl.BlockSpec((mt, bw), lambda i, j, p: (i, p * j)),
            pl.BlockSpec((mt, 1), lambda i, j, p: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, fp), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((mt, fp), jnp.bfloat16),
            pltpu.VMEM((mt, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(hq, h_scale, w, w, ws.reshape(1, f2), ws.reshape(1, f2))
    return q, ts


def _silu_quant_kernel(hid_ref, q_ref, s_ref, *, ffn: int):
    """One-pass SwiGLU gate + dynamic per-token int8 quantize.

    hid_ref: [1, BN, 2F] bf16 fc1 output (v ‖ g, reference chunk order,
    mlp.py:21-22). q_ref: [1, BN, F] int8; s_ref: [1, BN, 1] f32 scales.
    """
    import jax.nn

    x = hid_ref[0]  # [BN, 2F]
    # f32 gate math: Mosaic mis-lowers bf16 silu's internal f32 scalar
    # broadcasts (vector.broadcast f32 -> bf16 vector); the f32 form is
    # within one quantization step of the unfused bf16 chain.
    v = x[:, :ffn].astype(jnp.float32)
    g = x[:, ffn:].astype(jnp.float32)
    t32 = jax.nn.silu(g) * v
    absmax = jnp.max(jnp.abs(t32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q_ref[0] = jnp.clip(jnp.round(t32 / scale), -127, 127).astype(jnp.int8)
    s_ref[0] = scale


def fused_silu_quant(hid: Array, interpret: bool = False):
    """Fused ``quantize_activation(silu(g) * v)`` over the fc1 output.

    XLA lowers the unfused chain as two full passes over the [B, N, 2F]
    fc1 activation (one reduce for the absmax, one to rescale) — ~9% of
    the 5B int8 decoder loop. This Pallas kernel reads it once and writes
    int8 directly. Bit-identical to the unfused path (same op order).

    Args:
        hid: ``[B, N, 2F]`` fc1 output (v in the first F lanes, g in the
            second — the reference SwiGLU chunk order).

    Returns:
        ``(q [B, N, F] int8, scale [B, N, 1] f32)`` — drop-in inputs for
        ``int8_matmul_prequant``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, f2 = hid.shape
    ffn = f2 // 2
    bn = next((c for c in (256, 128, 64, 32, 16, 8, n) if n % c == 0), n)
    # Keep ~2x-buffered blocks + the f32 gate temporaries under ~10MB VMEM.
    while bn > 8 and 12 * bn * f2 > 10 * 1024 * 1024 and n % (bn // 2) == 0:
        bn //= 2

    kernel = functools.partial(_silu_quant_kernel, ffn=ffn)
    q, s = pl.pallas_call(
        kernel,
        grid=(b, n // bn),
        in_specs=[pl.BlockSpec((1, bn, f2), lambda i, j: (i, j, 0))],
        out_specs=(
            pl.BlockSpec((1, bn, ffn), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bn, 1), lambda i, j: (i, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, ffn), jnp.int8),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(hid)
    return q, s


def _rmsnorm_quant_kernel(x_ref, s_ref, q_ref, a_ref, *, eps: float):
    """fp32 RMSNorm + per-token dynamic int8 quantize, one HBM pass.

    x_ref: [1, BN, C] activations; s_ref: [1, C] norm gain;
    q_ref: [1, BN, C] int8; a_ref: [1, BN, 1] f32 scales.
    """
    x32 = x_ref[0].astype(jnp.float32)  # [BN, C]
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps) * s_ref[:, :].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q_ref[0] = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    a_ref[0] = scale


def fused_rmsnorm_quant(x: Array, scale: Array, eps: float = 1e-6,
                        interpret: bool = False):
    """Fused ``quantize_activation(rms_norm(x, scale))`` (Pallas).

    The unfused chain costs four passes over ``[B, N, C]`` in XLA (norm
    write, absmax read, rescale read+write); this kernel reads x once and
    writes int8 + scales. It quantizes the fp32 normed value directly
    (one fewer bf16 round-trip than the unfused path — within one
    quantization step).

    Returns ``(q [B, N, C] int8, a_scale [B, N, 1] f32)`` for
    ``int8_matmul_prequant``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    bn = next((v for v in (512, 256, 128, 64, 32, 16, 8, n) if n % v == 0), n)
    while bn > 8 and 10 * bn * c > 10 * 1024 * 1024 and n % (bn // 2) == 0:
        bn //= 2

    kernel = functools.partial(_rmsnorm_quant_kernel, eps=eps)
    q, a = pl.pallas_call(
        kernel,
        grid=(b, n // bn),
        in_specs=[
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bn, 1), lambda i, j: (i, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), jnp.int8),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, scale.reshape(1, c))
    return q, a


def can_fuse_silu_quant(n: int) -> bool:
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover — defensive
        return False
    return backend in ("tpu", "axon") and n % 8 == 0


def quantize_block_params(
    params: Params,
    offload: Optional[bool] = None,
    block_keys: Tuple[str, ...] = ("encoder_blocks", "decoder_blocks"),
) -> Params:
    """Quantize every block linear in a params pytree (idempotent).

    Returns a new pytree where block ``kernel`` leaves are replaced by
    ``kernel_int8`` + ``scale``; non-block params are untouched. ``offload``
    defaults to True for models over ~1B params (host-side quantization,
    frees each bf16 kernel as it converts — fits 5B on a 16GB chip).
    ``block_keys`` selects the stacked block subtrees (AE default; DiT
    passes ``("blocks",)`` — see ``models/dit.py::DiT.quantize``).
    """
    if offload is None:
        total = sum(x.size for x in jax.tree_util.tree_leaves(params))
        offload = total > 1_000_000_000

    def q_stack(stack: Params) -> Params:
        out: Params = {}
        for name, sub in stack.items():
            if isinstance(sub, dict):
                if name in _QUANT_KEYS and "kernel" in sub:
                    # FFN kernels are zero-padded to 128-aligned SwiGLU
                    # halves so the fused FFN kernel can column-tile them;
                    # exact for every consumer (see pad_fc1_kernel).
                    k = sub["kernel"]
                    if name == "fc1":
                        k = pad_fc1_kernel(k)
                    elif name == "fc2":
                        k = pad_fc2_kernel(k)
                    out[name] = quantize_weight(k, offload=offload)
                elif "kernel_int8" in sub:
                    out[name] = sub  # already quantized
                else:
                    out[name] = q_stack(sub)
            else:
                out[name] = sub
        return out

    result: Params = {}
    for key, value in params.items():
        if key in block_keys:
            result[key] = q_stack(value)
        else:
            result[key] = value
    return result


def quantize_block_params_device(
    params: Params,
    block_keys: Tuple[str, ...] = ("encoder_blocks", "decoder_blocks"),
) -> Params:
    """Device-native quantization of an AE params pytree, leaf by leaf.

    For multi-GB models on the remote-tunnel runtime, ``offload=True``
    (host numpy) costs a minutes-slow ``device_get``; this path quantizes
    each stacked block kernel ON DEVICE with a ``lax.map`` over the depth
    axis (one ~200MB fp32 transient per layer instead of a full-stack
    fp32 copy) and deletes the source kernel as it converts, so peak HBM
    stays ~params(bf16) + params(int8) for one leaf at a time.
    """

    @functools.lru_cache(maxsize=16)
    def _jq(shape, dtype_name, kind):
        def one(k):
            # Pad per depth slice (inside the map) so the bf16 transient is
            # one layer, not the whole 4GB+ stacked leaf.
            if kind == "fc1":
                k = pad_fc1_kernel(k)
            elif kind == "fc2":
                k = pad_fc2_kernel(k)
            k32 = k.astype(jnp.float32)
            absmax = jnp.max(jnp.abs(k32), axis=-2, keepdims=True)
            scale = jnp.maximum(absmax / 127.0, 1e-12)
            q = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
            return q, scale.squeeze(-2)

        return jax.jit(lambda k: jax.lax.map(one, k))

    def q_leaf(kernel: Array, kind: str) -> Dict[str, Array]:
        q, scale = _jq(kernel.shape, kernel.dtype.name, kind)(kernel)
        q.block_until_ready()
        if hasattr(kernel, "delete"):
            kernel.delete()
        return {"kernel_int8": q, "scale": scale.astype(jnp.float32)}

    def q_stack(stack: Params) -> Params:
        out: Params = {}
        for name, sub in stack.items():
            if isinstance(sub, dict):
                if name in _QUANT_KEYS and "kernel" in sub:
                    out[name] = q_leaf(sub["kernel"], name)
                elif "kernel_int8" in sub:
                    out[name] = sub
                else:
                    out[name] = q_stack(sub)
            else:
                out[name] = sub
        return out

    result: Params = {}
    for key, value in params.items():
        if key in block_keys:
            result[key] = q_stack(value)
        else:
            result[key] = value
    return result


def init_params_quantized(cfg, rng, scale_mag: float = 0.01) -> Params:
    """Random int8-quantized AE params, built int8-native (no bf16 staging).

    For throughput benchmarking of the quantized path: avoids materializing
    the full-precision model first (the real checkpoint path goes through
    ``quantize_block_params``).
    """
    from vitok_tpu.models.ae import _linear_init

    def q_linear(key, fan_in, fan_out, depth=None, kind=None):
        k1, k2 = jax.random.split(key)
        shape = (fan_in, fan_out) if depth is None else (depth, fan_in, fan_out)
        sshape = (fan_out,) if depth is None else (depth, fan_out)
        q = jax.random.randint(k1, shape, -127, 128, jnp.int8)
        s = (
            jnp.abs(jax.random.normal(k2, sshape, jnp.float32)) * scale_mag
            + 1e-6
        )
        # Match the padded FFN layout quantize_block_params* emits (zero pad
        # columns/rows so the fused and unfused paths agree).
        if kind == "fc1":
            q, s = pad_fc1_kernel(q), pad_fc1_kernel(s)
        elif kind == "fc2":
            q = pad_fc2_kernel(q)
        return {"kernel_int8": q, "scale": s}

    def q_stack(key, depth, width, ffn, head_dim):
        ks = jax.random.split(key, 4)
        return {
            "norm1": {"scale": jnp.ones((depth, width), jnp.float32)},
            "attn": {
                "qkv": q_linear(ks[0], width, 3 * width, depth),
                "out": q_linear(ks[1], width, width, depth),
                "norm_q": {"scale": jnp.ones((depth, head_dim), jnp.float32)},
                "norm_k": {"scale": jnp.ones((depth, head_dim), jnp.float32)},
            },
            "ffn": {
                "fc1": q_linear(ks[2], width, 2 * ffn, depth, kind="fc1"),
                "fc2": q_linear(ks[3], ffn, width, depth, kind="fc2"),
            },
            "layer_scale": {
                "gamma": jnp.full((depth, width), cfg.layer_scale_init, jnp.float32)
            },
        }

    ks = jax.random.split(rng, 6)
    params: Params = {}
    if cfg.encoder:
        params["patch_embed"] = _linear_init(
            ks[0], cfg.pixels_per_token, cfg.encoder_width, jnp.bfloat16
        )
        params["encoder_blocks"] = q_stack(
            ks[1], cfg.encoder_depth, cfg.encoder_width,
            cfg.encoder_ffn_dim, cfg.encoder_head_dim,
        )
        params["to_code"] = _linear_init(
            ks[2], cfg.encoder_width, cfg.channels_per_token, jnp.bfloat16
        )
    if cfg.decoder:
        params["decoder_embed"] = _linear_init(
            ks[3], cfg.channels_per_token, cfg.decoder_width, jnp.bfloat16
        )
        params["decoder_blocks"] = q_stack(
            ks[4], cfg.decoder_depth, cfg.decoder_width,
            cfg.decoder_ffn_dim, cfg.decoder_head_dim,
        )
        params["to_pixels"] = _linear_init(
            ks[5], cfg.decoder_width, cfg.pixels_per_token, jnp.bfloat16
        )
    return params


def gate_sensitive_params(params: Params, seed: int = 0,
                          lo: float = 0.5, hi: float = 1.5) -> Params:
    """Replace LayerScale gamma leaves with O(1) random values.

    The reference LayerScale init is 1e-4 (``vitok/models/ae.py:87``), which
    attenuates every quantized block's contribution to the residual stream by
    four orders of magnitude — an int8-vs-bf16 SSIM gate run at init weights
    is therefore near-vacuous (measured: max relative output diff 1.2e-6 at
    gamma=1e-4 vs ~1e-2 at gamma=1 on the same config). Quality gates must
    run on gamma ~ O(1), the scale trained checkpoints actually reach. This
    returns the same pytree with every ``layer_scale/gamma`` leaf replaced by
    U(lo, hi) values (deterministic in ``seed``); all other leaves are shared,
    not copied.
    """
    rng = jax.random.key(seed)

    def visit(tree, rng):
        out: Params = {}
        for name, sub in tree.items():
            if name == "layer_scale" and isinstance(sub, dict) and "gamma" in sub:
                rng, sub_rng = jax.random.split(rng)
                g = sub["gamma"]
                out[name] = {
                    "gamma": jax.random.uniform(
                        sub_rng, g.shape, jnp.float32, lo, hi
                    ).astype(g.dtype)
                }
            elif isinstance(sub, dict):
                rng, sub_rng = jax.random.split(rng)
                out[name] = visit(sub, sub_rng)
            else:
                out[name] = sub
        return out

    return visit(params, rng)


def degrade_block_weights(params: Params, bits: int = 4) -> Params:
    """Negative control for quality gates: re-round block kernels to ``bits``.

    Simulates a low-bit quantizer by snapping every block linear kernel to a
    symmetric ``bits``-bit per-channel grid (kept in the original dtype, so
    the model still runs the full-precision path). At 4 bits the weight noise
    is ~8x the int8 level — a non-vacuous SSIM gate MUST fail on it.
    """
    qmax = float(2 ** (bits - 1) - 1)

    def snap(kernel: Array) -> Array:
        k32 = kernel.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(k32), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax / qmax, 1e-12)
        return (jnp.round(k32 / scale) * scale).astype(kernel.dtype)

    def visit(tree: Params) -> Params:
        out: Params = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                if name in _QUANT_KEYS and "kernel" in sub:
                    out[name] = dict(sub, kernel=snap(sub["kernel"]))
                else:
                    out[name] = visit(sub)
            else:
                out[name] = sub
        return out

    return {
        k: visit(v) if k in ("encoder_blocks", "decoder_blocks") else v
        for k, v in params.items()
    }


def is_quantized(params: Params) -> bool:
    return any(
        "kernel_int8" in str(p)
        for p in [jax.tree_util.tree_structure(params)]
    )


__all__ = [
    "quantize_weight",
    "int8_linear",
    "quantize_block_params",
    "is_quantized",
]
