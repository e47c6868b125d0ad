"""DiT — diffusion transformer over ViTok latents (flow matching).

The reference release documents DiT generation (DiT-L/450M, DiT-G/1.2B flow
matching over ViTok latents — docs/index.html:1462-1470) and ships tests for
a ``vitok.models.dit`` module that is absent from the package
(SURVEY.md §2.11). This is a real TPU-native implementation of that
documented API surface:

* dict forward ``{z, t, context, row_idx?, col_idx?} -> prediction`` with the
  same shape as ``z`` (``tests/cpu/test_dit.py:83-118``),
* ``timestep_embedding`` sinusoidal embedding (values bounded by 1),
* classifier-free guidance by batch doubling with null class ``text_dim``
  (test_dit.py:200-239),
* optional class token and register tokens prepended to the sequence
  (test_dit.py:268-331); special tokens are stripped from the output,
* ``decode_variant("Bd4/256")`` -> width/depth/heads/mlp + max_tokens.

Architecture is the standard adaLN-zero DiT conditioned on timestep+class,
built from the same TPU primitives as the AE (RMSNorm fp32, 2D RoPE,
masked attention, SwiGLU) with blocks stacked for ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitok_tpu.models.ae import (
    _BASE_DEPTHS,
    _BASE_HEADS,
    _BASE_MLP,
    _BASE_WIDTHS,
    _linear,
    _linear_init,
    _linear_init_nobias,
    _parse_variant_name,
)
from vitok_tpu.ops.attention import dot_product_attention
from vitok_tpu.ops.mlp import round_hidden_dim
from vitok_tpu.ops.norms import rms_norm
from vitok_tpu.ops.rope import apply_rotary_emb, compute_2d_freqs_cis

Array = jax.Array
Params = Dict[str, Any]


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    """Sinusoidal timestep embedding ``[B] -> [B, dim]`` (values in [-1, 1])."""
    t = jnp.asarray(t, jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def decode_variant(variant: str) -> Dict[str, Any]:
    """Parse a DiT variant like ``"Bd4/256"`` -> arch dict + max_tokens."""
    if "/" in variant:
        name, _, rest = variant.partition("/")
        max_tokens = int(rest)
    else:
        name, max_tokens = variant, 256
    arch = _parse_variant_name(name)
    return {
        "width": arch["width"],
        "depth": arch["depth"],
        "heads": arch["heads"],
        "mlp_factor": arch["mlp_factor"],
        "max_tokens": max_tokens,
    }


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    width: int = 768
    depth: int = 12
    heads: int = 12
    mlp_factor: float = _BASE_MLP
    max_tokens: int = 256
    code_width: int = 32
    text_dim: int = 1000  # number of classes; index text_dim = null class
    use_layer_scale: bool = False
    layer_scale_init: float = 1e-5
    class_token: bool = False
    reg_tokens: int = 0
    rope_theta: float = 10000.0
    checkpoint: int = 0
    attn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def ffn_dim(self) -> int:
        return round_hidden_dim(int(self.width * self.mlp_factor))

    @property
    def num_special_tokens(self) -> int:
        return int(self.class_token) + self.reg_tokens


def _filter_known(kw: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(DiTConfig)}
    return {k: v for k, v in kw.items() if k in names}


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(cfg: DiTConfig, rng: Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, 12)
    w, hd, ffn = cfg.width, cfg.head_dim, cfg.ffn_dim
    params: Params = {
        "input_proj": _linear_init(keys[0], cfg.code_width, w, dtype),
        # timestep MLP: 256-dim sinusoid -> width -> width
        "t_embed": {
            "fc1": _linear_init(keys[1], 256, w, dtype),
            "fc2": _linear_init(keys[2], w, w, dtype),
        },
        # class embedding table incl. the null class (CFG)
        "ctx_embed": jax.random.normal(
            keys[3], (cfg.text_dim + 1, w), dtype
        ) * 0.02,
        "final": {
            # Output head: small init (a fully zero-init head would make the
            # model output identically zero and conditioning unobservable;
            # the residual gates below are still adaLN-zero).
            "mod": {
                "kernel": jax.random.normal(keys[7], (w, 2 * w), dtype) * 0.02,
                "bias": jnp.zeros((2 * w,), dtype),
            },
            "proj": _linear_init(keys[8], w, cfg.code_width, dtype),
        },
    }

    def init_block(r: Array) -> Params:
        r_qkv, r_out, r_fc1, r_fc2, r_mod = jax.random.split(r, 5)
        blk: Params = {
            "norm1": {"scale": jnp.ones((w,), dtype)},
            "attn": {
                "qkv": _linear_init_nobias(r_qkv, w, 3 * w, dtype),
                "out": _linear_init_nobias(r_out, w, w, dtype),
                "norm_q": {"scale": jnp.ones((hd,), dtype)},
                "norm_k": {"scale": jnp.ones((hd,), dtype)},
            },
            "ffn": {
                "fc1": _linear_init_nobias(r_fc1, w, 2 * ffn, dtype),
                "fc2": _linear_init_nobias(r_fc2, ffn, w, dtype),
            },
            # adaLN-zero: 3 modulation params (shift, scale, gate) — the
            # parallel-block layout needs one set (attn+mlp share the norm).
            "mod": {
                "kernel": jnp.zeros((w, 3 * w), dtype),
                "bias": jnp.zeros((3 * w,), dtype),
            },
        }
        if cfg.use_layer_scale:
            blk["layer_scale"] = {
                "gamma": jnp.full((w,), cfg.layer_scale_init, dtype)
            }
        return blk

    params["blocks"] = jax.vmap(init_block)(
        jax.random.split(keys[4], cfg.depth)
    )
    if cfg.class_token:
        params["cls_token"] = jax.random.normal(keys[5], (1, 1, w), dtype) * 0.02
    if cfg.reg_tokens:
        params["reg_token"] = (
            jax.random.normal(keys[6], (1, cfg.reg_tokens, w), dtype) * 0.02
        )
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _dit_block(x, blk, cond, rope, *, num_heads, attn_impl,
               deterministic=True):
    """Parallel DiT block with adaLN-zero conditioning.

    When the block carries int8 weights (``DiT.quantize()``), the same
    int8 recipe as the AE blocks applies (``models/ae.py::_block_body``):
    the modulated input quantizes ONCE and feeds both column matmuls
    (qkv + fc1, optionally the fused fc1+SwiGLU+requantize kernel), the
    small-N attention megakernel consumes the flat QKV GEMM output
    directly (QK-RMSNorm + rotate-half RoPE + softmax + PV, no 5-D
    relayout copies), and fc2 takes the one-pass silu+quantize output.
    adaLN modulation (``mod``) stays bf16 — it is a per-image [B, 3C]
    GEMM, ~1/N of a token matmul.
    """
    b, n, c = x.shape
    head_dim = c // num_heads
    mod = _linear(cond, blk["mod"]).reshape(b, 1, 3, c)
    shift, scale, gate = mod[:, :, 0], mod[:, :, 1], mod[:, :, 2]

    h = rms_norm(x, blk["norm1"]["scale"])
    h = h * (1.0 + scale) + shift

    qkv_p, fc1_p = blk["attn"]["qkv"], blk["ffn"]["fc1"]
    shared_int8 = "kernel_int8" in qkv_p and "kernel_int8" in fc1_p
    if shared_int8:
        from vitok_tpu.ops.quant import (
            can_fuse_ffn,
            fused_ffn_int8,
            int8_matmul_prequant,
            quantize_activation,
        )

        # The adaLN shift/scale sit between the norm and the matmuls, so
        # the fused rmsnorm+quant kernel doesn't apply — quantize the
        # modulated activations once and share across qkv/fc1.
        hq, h_scale = quantize_activation(h)
        qkv_flat = int8_matmul_prequant(hq, h_scale, qkv_p, h.dtype)
        f2 = fc1_p["kernel_int8"].shape[-1]
        if can_fuse_ffn(b * n, c, f2):
            hid = fused_ffn_int8(
                hq.reshape(b * n, c), h_scale.reshape(b * n, 1), fc1_p
            )
        else:
            hid = int8_matmul_prequant(hq, h_scale, fc1_p, h.dtype)
    else:
        qkv_flat = _linear(h, qkv_p)
        hid = _linear(h, fc1_p)

    from vitok_tpu.ops.fused_attention import can_fuse, fused_qkv_attention

    # Inference-only routing for "auto" (AE precedent: the megakernel's
    # recompute backward measured slower than the XLA path in training);
    # attn_impl="fused" forces it either way.
    if (
        attn_impl in ("auto", "fused")
        and (deterministic or attn_impl == "fused")
        and can_fuse(n, c, num_heads)
    ):
        attn = fused_qkv_attention(
            qkv_flat,
            blk["attn"]["norm_q"]["scale"],
            blk["attn"]["norm_k"]["scale"],
            rope[0], rope[1],
            jnp.ones((b, n), jnp.int32),
            num_heads=num_heads,
        )
    else:
        qkv = qkv_flat.reshape(b, n, 3, num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = rms_norm(q, blk["attn"]["norm_q"]["scale"])
        k = rms_norm(k, blk["attn"]["norm_k"]["scale"])
        # Rotate-half convention (no lane shuffles). DiT checkpoints are
        # produced by this trainer, so no layout conversion is needed.
        q, k = apply_rotary_emb(q, k, rope[0], rope[1], convention="half")
        # Keep "auto" routing (flash for large N); "fused" falls back to
        # auto when the shape can't fuse.
        attn = dot_product_attention(
            q, k, v,
            impl="auto" if attn_impl == "fused" else attn_impl,
        ).reshape(b, n, c)
    attn = _linear(attn, blk["attn"]["out"])

    fc2_p = blk["ffn"]["fc2"]
    if isinstance(hid, tuple) or "kernel_int8" in fc2_p:
        from vitok_tpu.ops.quant import (
            can_fuse_silu_quant,
            fused_silu_quant,
            int8_matmul_prequant,
            quantize_activation,
        )

        if isinstance(hid, tuple):
            # fused_ffn_int8 already returns the gated (int8, scale) pair.
            tq, t_scale = hid
            tq = tq.reshape(b, n, -1)
            t_scale = t_scale.reshape(b, n, 1)
        else:
            mv, mg = jnp.split(hid, 2, axis=-1)
            t = jax.nn.silu(mg) * mv
            if can_fuse_silu_quant(n):
                tq, t_scale = fused_silu_quant(hid)
            else:
                tq, t_scale = quantize_activation(t)
        mlp = int8_matmul_prequant(tq, t_scale, fc2_p, x.dtype)
    else:
        mv, mg = jnp.split(hid, 2, axis=-1)
        mlp = _linear(jax.nn.silu(mg) * mv, fc2_p)

    combined = attn + mlp
    if "layer_scale" in blk:
        combined = combined * blk["layer_scale"]["gamma"].astype(combined.dtype)
    return x + gate * combined


def apply(
    params: Params,
    dit_input: Dict[str, Array],
    cfg: DiTConfig,
    compute_dtype=jnp.bfloat16,
    deterministic: bool = True,
) -> Array:
    """Forward: ``{z, t, context, row_idx?, col_idx?}`` -> prediction [B,N,c]."""
    z = dit_input["z"].astype(compute_dtype)
    b, n, _ = z.shape

    # Positions: given, or an implicit square grid.
    if "row_idx" in dit_input and dit_input.get("row_idx") is not None:
        row = dit_input["row_idx"].astype(jnp.float32)
        col = dit_input["col_idx"].astype(jnp.float32)
    else:
        # Implicit grid: ceil side so any token count is covered (row-major
        # prefix of a side x side grid).
        side = int(math.ceil(math.sqrt(n)))
        yy, xx = jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij")
        row = jnp.tile(yy.reshape(1, -1), (b, 1)).astype(jnp.float32)[:, :n]
        col = jnp.tile(xx.reshape(1, -1), (b, 1)).astype(jnp.float32)[:, :n]

    x = _linear(z, params["input_proj"])

    # Conditioning: timestep + class (null class = index text_dim).
    t_emb = timestep_embedding(dit_input["t"], 256).astype(compute_dtype)
    cond = _linear(t_emb, params["t_embed"]["fc1"])
    cond = _linear(jax.nn.silu(cond), params["t_embed"]["fc2"])
    context = dit_input.get("context")
    if context is not None:
        ctx = params["ctx_embed"].astype(compute_dtype)[
            jnp.clip(context.astype(jnp.int32), 0, cfg.text_dim)
        ]
        cond = cond + ctx
    cond = jax.nn.silu(cond)[:, None, :]  # [B, 1, W]

    # Special tokens prepended (no rotation: positions 0).
    n_special = cfg.num_special_tokens
    if n_special:
        specials = []
        if cfg.class_token:
            specials.append(
                jnp.tile(params["cls_token"].astype(compute_dtype), (b, 1, 1))
            )
        if cfg.reg_tokens:
            specials.append(
                jnp.tile(params["reg_token"].astype(compute_dtype), (b, 1, 1))
            )
        x = jnp.concatenate(specials + [x], axis=1)
        zeros = jnp.zeros((b, n_special), jnp.float32)
        row = jnp.concatenate([zeros, row], axis=1)
        col = jnp.concatenate([zeros, col], axis=1)

    rope = compute_2d_freqs_cis(row, col, cfg.head_dim, cfg.rope_theta)

    def body(carry, blk):
        out = _dit_block(
            carry, blk, cond, rope,
            num_heads=cfg.heads, attn_impl=cfg.attn_impl,
            deterministic=deterministic,
        )
        return out, None

    if cfg.checkpoint > 0:
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.nothing_saveable
        )
    x, _ = jax.lax.scan(body, x, params["blocks"])

    if n_special:
        x = x[:, n_special:]

    # adaLN-zero final head.
    mod = _linear(cond[:, 0], params["final"]["mod"]).reshape(b, 1, 2, cfg.width)
    shift, scale = mod[:, :, 0], mod[:, :, 1]
    h = rms_norm(x, jnp.ones((cfg.width,), jnp.float32))
    h = h * (1.0 + scale) + shift
    return _linear(h, params["final"]["proj"])


# ---------------------------------------------------------------------------
# Object API (matches the reference test surface)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _jitted(cfg: DiTConfig, dtype_name: str):
    dtype = jnp.dtype(dtype_name)

    def wrapped(params, z, t, context, row, col):
        d = {"z": z, "t": t, "context": context, "row_idx": row, "col_idx": col}
        if row is None:
            d.pop("row_idx"), d.pop("col_idx")
        return apply(params, d, cfg, compute_dtype=dtype)

    return jax.jit(wrapped)


class DiT:
    """Thin object wrapper: ``DiT(**decode_variant("Bd4/256"), code_width=32,
    text_dim=1000)`` mirroring the documented reference surface."""

    def __init__(self, params: Optional[Params] = None, seed: int = 0,
                 param_dtype=jnp.float32, compute_dtype=jnp.float32, **kwargs):
        self.cfg = DiTConfig(**_filter_known(kwargs))
        self.compute_dtype = jnp.dtype(compute_dtype)
        if params is None:
            params = init_params(self.cfg, jax.random.key(seed), param_dtype)
        self.params = params

    # test-surface properties
    @property
    def code_width(self) -> int:
        return self.cfg.code_width

    @property
    def text_dim(self) -> int:
        return self.cfg.text_dim

    @property
    def cls_token(self):
        return self.params.get("cls_token")

    @property
    def reg_token(self):
        return self.params.get("reg_token")

    @property
    def num_special_tokens(self) -> int:
        return self.cfg.num_special_tokens

    def __call__(self, dit_input: Dict[str, Array]) -> Array:
        fn = _jitted(self.cfg, self.compute_dtype.name)
        return fn(
            self.params,
            jnp.asarray(dit_input["z"]),
            jnp.asarray(dit_input["t"]),
            jnp.asarray(dit_input["context"])
            if dit_input.get("context") is not None
            else None,
            jnp.asarray(dit_input["row_idx"])
            if dit_input.get("row_idx") is not None
            else None,
            jnp.asarray(dit_input["col_idx"])
            if dit_input.get("col_idx") is not None
            else None,
        )

    forward = __call__

    def quantize(self) -> "DiT":
        """int8-quantize the block linears (idempotent, AE.quantize analog).

        qkv/out/fc1/fc2 become int8-weight x dynamic-int8-activation (fc1/
        fc2 padded for the fused FFN kernel); adaLN ``mod``, norms, embeds
        and the final head stay full precision. Sampling then runs the AE's
        int8 recipe inside ``_dit_block`` (shared activation quantize,
        fused FFN, megakernel attention).
        """
        from vitok_tpu.ops.quant import quantize_block_params_device

        self.params = quantize_block_params_device(
            self.params, block_keys=("blocks",)
        )
        return self

    def eval(self) -> "DiT":
        return self

    def num_params(self) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(self.params))


__all__ = [
    "DiT",
    "DiTConfig",
    "decode_variant",
    "timestep_embedding",
    "init_params",
    "apply",
]
