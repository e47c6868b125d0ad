"""Vision Transformer Autoencoder (NaFlex) — TPU-native functional core.

Capability parity with reference ``vitok/models/ae.py`` (Na-VAE/vitok-release):
asymmetric encoder/decoder ViT over NaFlex patch dicts, parallel transformer
blocks (one pre-norm feeding both attention and SwiGLU, summed, LayerScale,
residual), per-head-dim QK RMSNorm, 2D RoPE, stochastic depth ramped linearly
over decoder depth, affine-free LayerNorm latent head, and the
``decode_variant`` string DSL (ae.py:286-346).

TPU-first design decisions (deliberately *not* a port of the torch module
tree):

* **Params are a plain pytree** of stacked per-depth arrays; the block stack
  runs under ``jax.lax.scan`` so XLA compiles ONE block body regardless of
  depth (compile time O(1) in depth, enables pipelining over layers).
* **Pure functions** ``encode_apply`` / ``decode_apply`` take
  ``(params, patch_dict)`` with a hashable static config; ``jax.jit`` caches
  per (config, shape) — the whole encode/decode is a single XLA program.
* **Gradient checkpointing** via ``jax.checkpoint`` on the scanned block body
  (reference: ``torch.utils.checkpoint`` every k-th block, ae.py:159-160).
* Attention honors the NaFlex patch mask on every backend (the reference's
  flash path silently drops it).
* The thin ``AE`` class at the bottom mirrors the reference's dict-in/dict-out
  object API for drop-in familiarity.
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vitok_tpu.ops.attention import dot_product_attention
from vitok_tpu.ops.mlp import round_hidden_dim
from vitok_tpu.ops.norms import layer_norm, layer_scale, rms_norm
from vitok_tpu.ops.rope import apply_rotary_emb, compute_2d_freqs_cis

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AEConfig:
    """Static architecture configuration (hashable → usable as a jit static)."""

    pixels_per_token: int = 768
    channels_per_token: int = 32
    encoder_width: int = 1024
    decoder_width: int = 1024
    encoder_depth: int = 4
    decoder_depth: int = 24
    encoder_heads: int = 12
    decoder_heads: int = 12
    mlp_factor: float = 2.67
    # Gradient checkpointing: 0 = none, 1 = remat every block (one scanned
    # body, optionally with a remat_save policy), k>1 = every k-th block
    # (reference granularity), -1 = per-layer UNROLLED remat (no scan; the
    # fastest measured training config on v5e but depth-specialized compile,
    # ~5 min at 350M).
    checkpoint: int = 0
    # Named intermediates to SAVE under remat (checkpoint=1): subset of
    # {"qkv_out", "ffn_hid", "attn_out", "h_norm", "q_rot", "k_rot"}.
    # Empty = full remat (nothing saveable). This gives k-like recompute
    # reduction with ONE scanned body — the structural every-k-th grouping
    # (checkpoint=k>1) crashes the remote TPU compile helper (CLAUDE.md),
    # the policy form does not.
    remat_save: Tuple[str, ...] = ()
    spatial_stride: int = 16
    temporal_stride: int = 1
    use_layer_scale: bool = True
    layer_scale_init: float = 1e-4
    drop_path_rate: float = 0.0
    encoder: bool = True
    decoder: bool = True
    sw: Optional[int] = None
    attn_impl: str = "auto"
    rope_theta: float = 10000.0

    def __post_init__(self):
        if not self.encoder and not self.decoder:
            raise ValueError("At least one of encoder or decoder must be True")
        # Reference: sw <= 0 disables sliding window (ae.py:99).
        if self.sw is not None and self.sw <= 0:
            object.__setattr__(self, "sw", None)
        if not isinstance(self.remat_save, tuple):
            object.__setattr__(self, "remat_save", tuple(self.remat_save))

    @property
    def encoder_head_dim(self) -> int:
        return self.encoder_width // self.encoder_heads

    @property
    def decoder_head_dim(self) -> int:
        return self.decoder_width // self.decoder_heads

    @property
    def encoder_ffn_dim(self) -> int:
        return round_hidden_dim(int(self.encoder_width * self.mlp_factor))

    @property
    def decoder_ffn_dim(self) -> int:
        return round_hidden_dim(int(self.decoder_width * self.mlp_factor))

    @classmethod
    def from_variant(cls, variant: str, **overrides) -> "AEConfig":
        cfg = decode_variant(variant)
        cfg.update(overrides)
        return cls(**_filter_known(cfg))


def _filter_known(kw: Dict[str, Any]) -> Dict[str, Any]:
    """Swallow unknown kwargs like the reference AE's ``**kwargs`` (ae.py:92)."""
    names = {f.name for f in dataclasses.fields(AEConfig)}
    return {k: v for k, v in kw.items() if k in names}


# ---------------------------------------------------------------------------
# Variant DSL  (parity with reference decode_variant, ae.py:286-346)
# ---------------------------------------------------------------------------

_BASE_WIDTHS = {"B": 768, "L": 1024, "G": 1728, "T": 3072, "E": 4096}
_BASE_DEPTHS = {"B": 12, "L": 24, "G": 32, "T": 40, "E": 48}
_BASE_HEADS = {"B": 12, "L": 16, "G": 24, "T": 24, "E": 32}
_BASE_MLP = 2.67


def _parse_variant_name(variant_name: str) -> Dict[str, Any]:
    """Parse one side of the variant string (e.g. ``Ld4`` or ``w512_d8_h8``)."""
    if variant_name.startswith("w") and "_d" in variant_name and "_h" in variant_name:
        parts = variant_name.split("_")
        width = int(parts[0][1:])
        depth = int(parts[1][1:])
        heads = int(parts[2][1:])
        mlp = (
            float(parts[3][1:])
            if len(parts) > 3 and parts[3].startswith("m")
            else _BASE_MLP
        )
        return {"width": width, "depth": depth, "heads": heads, "mlp_factor": mlp}

    width_m = re.search(r"w(\d+)", variant_name)
    depth_m = re.search(r"d(\d+)", variant_name)
    heads_m = re.search(r"h(\d+)", variant_name)
    mlp_m = re.search(r"m(\d+(?:\.\d+)?)", variant_name)
    base = re.sub(r"w\d+|d\d+|h\d+|m\d+(?:\.\d+)?", "", variant_name)
    if base and base not in _BASE_WIDTHS:
        raise ValueError(
            f"Unknown base variant: {base}. Available: {list(_BASE_WIDTHS.keys())}"
        )
    return {
        "width": int(width_m.group(1)) if width_m else _BASE_WIDTHS.get(base, 768),
        "depth": int(depth_m.group(1)) if depth_m else _BASE_DEPTHS.get(base, 12),
        "heads": int(heads_m.group(1)) if heads_m else _BASE_HEADS.get(base, 12),
        "mlp_factor": float(mlp_m.group(1)) if mlp_m else _BASE_MLP,
    }


def decode_variant(variant: str) -> Dict[str, Any]:
    """Parse a variant string like ``"B/1x16x64"`` or ``"Ld4-Ld24/1x16x64"``.

    Geometry: ``{t}x{s}x{c}`` → temporal stride, spatial stride (patch size),
    latent channels; ``pixels_per_token = s*s*t*3``. Two-part geometry
    ``{s}x{c}`` implies t=1. ``mlp_factor`` takes the max of enc/dec sides
    (reference ae.py:341).
    """
    v, rest = variant.split("/")
    enc_v, dec_v = v.split("-") if "-" in v else (v, v)
    parts = list(map(int, rest.split("x")))
    if len(parts) == 3:
        temporal_stride, spatial_stride, channel_size = parts
    elif len(parts) == 2:
        temporal_stride, spatial_stride, channel_size = 1, parts[0], parts[1]
    else:
        raise ValueError(f"Invalid variant format: {variant}")
    enc = _parse_variant_name(enc_v)
    dec = _parse_variant_name(dec_v)
    return {
        "encoder_width": enc["width"],
        "decoder_width": dec["width"],
        "encoder_depth": enc["depth"],
        "decoder_depth": dec["depth"],
        "encoder_heads": enc["heads"],
        "decoder_heads": dec["heads"],
        "mlp_factor": max(enc["mlp_factor"], dec["mlp_factor"]),
        "temporal_stride": temporal_stride,
        "spatial_stride": spatial_stride,
        "channels_per_token": channel_size,
        "pixels_per_token": spatial_stride * spatial_stride * temporal_stride * 3,
    }


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _linear_init(rng: Array, fan_in: int, fan_out: int, dtype) -> Dict[str, Array]:
    """Torch-nn.Linear-compatible init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)
    k_rng, b_rng = jax.random.split(rng)
    return {
        "kernel": jax.random.uniform(
            k_rng, (fan_in, fan_out), dtype, minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(
            b_rng, (fan_out,), dtype, minval=-bound, maxval=bound
        ),
    }


def _linear_init_nobias(rng: Array, fan_in: int, fan_out: int, dtype) -> Dict[str, Array]:
    bound = 1.0 / (fan_in ** 0.5)
    return {
        "kernel": jax.random.uniform(
            rng, (fan_in, fan_out), dtype, minval=-bound, maxval=bound
        )
    }


def _init_block_stack(
    rng: Array,
    depth: int,
    width: int,
    ffn_dim: int,
    head_dim: int,
    layer_scale_init: float,
    use_layer_scale: bool,
    dtype,
) -> Params:
    """Init a stack of ``depth`` parallel blocks, depth as the leading axis."""

    def init_one(r: Array) -> Params:
        r_qkv, r_out, r_fc1, r_fc2 = jax.random.split(r, 4)
        p: Params = {
            "norm1": {"scale": jnp.ones((width,), dtype)},
            "attn": {
                "qkv": _linear_init_nobias(r_qkv, width, 3 * width, dtype),
                "out": _linear_init_nobias(r_out, width, width, dtype),
                "norm_q": {"scale": jnp.ones((head_dim,), dtype)},
                "norm_k": {"scale": jnp.ones((head_dim,), dtype)},
            },
            "ffn": {
                "fc1": _linear_init_nobias(r_fc1, width, 2 * ffn_dim, dtype),
                "fc2": _linear_init_nobias(r_fc2, ffn_dim, width, dtype),
            },
        }
        if use_layer_scale:
            p["layer_scale"] = {
                "gamma": jnp.full((width,), layer_scale_init, dtype)
            }
        return p

    return jax.vmap(init_one)(jax.random.split(rng, depth))


def init_params(cfg: AEConfig, rng: Array, dtype=jnp.float32) -> Params:
    """Initialize the full parameter pytree for the given config."""
    params: Params = {}
    r_enc, r_dec, r_pe, r_tc, r_de, r_tp = jax.random.split(rng, 6)
    if cfg.encoder:
        params["patch_embed"] = _linear_init(
            r_pe, cfg.pixels_per_token, cfg.encoder_width, dtype
        )
        params["encoder_blocks"] = _init_block_stack(
            r_enc,
            cfg.encoder_depth,
            cfg.encoder_width,
            cfg.encoder_ffn_dim,
            cfg.encoder_head_dim,
            cfg.layer_scale_init,
            cfg.use_layer_scale,
            dtype,
        )
        params["to_code"] = _linear_init(
            r_tc, cfg.encoder_width, cfg.channels_per_token, dtype
        )
    if cfg.decoder:
        params["decoder_embed"] = _linear_init(
            r_de, cfg.channels_per_token, cfg.decoder_width, dtype
        )
        params["decoder_blocks"] = _init_block_stack(
            r_dec,
            cfg.decoder_depth,
            cfg.decoder_width,
            cfg.decoder_ffn_dim,
            cfg.decoder_head_dim,
            cfg.layer_scale_init,
            cfg.use_layer_scale,
            dtype,
        )
        params["to_pixels"] = _linear_init(
            r_tp, cfg.decoder_width, cfg.pixels_per_token, dtype
        )
    return params


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _linear(x: Array, p: Params) -> Array:
    if "kernel_int8" in p:
        from vitok_tpu.ops.quant import int8_linear

        y = int8_linear(x, p)
    else:
        y = jnp.dot(
            x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _block_body(
    x: Array,
    blk: Params,
    rope: Tuple[Array, Array],
    patch_mask: Optional[Array],
    *,
    num_heads: int,
    sliding_window: Optional[int],
    attn_impl: str,
    drop_path_prob: Array,
    drop_path_rng: Optional[Array],
    deterministic: bool = True,
) -> Array:
    """One parallel transformer block: x + dp(ls(attn(norm(x)) + mlp(norm(x)))).

    Mirrors reference Block.forward (ae.py:55-65) with fused QKV, QK-RMSNorm
    per head_dim, RoPE post-norm, and SwiGLU sharing the same normed input.
    """
    b, n, c = x.shape
    head_dim = c // num_heads

    h = checkpoint_name(rms_norm(x, blk["norm1"]["scale"]), "h_norm")

    # qkv and fc1 read the same normed input: under int8, quantize h once
    # and share the int8 activations across both column-parallel matmuls.
    qkv_p, fc1_p = blk["attn"]["qkv"], blk["ffn"]["fc1"]
    shared_int8 = "kernel_int8" in qkv_p and "kernel_int8" in fc1_p
    if shared_int8:
        from vitok_tpu.ops.quant import (
            can_fuse_ffn,
            can_fuse_silu_quant,
            fused_ffn_int8,
            fused_rmsnorm_quant,
            int8_matmul_prequant,
            quantize_activation,
        )

        if can_fuse_silu_quant(n):
            # One-pass Pallas rmsnorm+quantize straight from the residual
            # stream (XLA needs four passes for the unfused chain); the
            # rms_norm above is dead in this branch and DCE'd.
            hq, h_scale = fused_rmsnorm_quant(x, blk["norm1"]["scale"])
        else:
            hq, h_scale = quantize_activation(h)
        qkv_out = int8_matmul_prequant(hq, h_scale, qkv_p, h.dtype)
        f2 = fc1_p["kernel_int8"].shape[-1]
        if can_fuse_ffn(b * n, c, f2):
            # Fused fc1-GEMM + SwiGLU + requantize: the [M, 2F] bf16 hidden
            # never reaches HBM (it round-trips ~1.1 GB per 5B decoder
            # block through the unfused chain). ``hid`` carries the
            # pre-gated (int8, scale) pair for the fc2 matmul below.
            hid = fused_ffn_int8(
                hq.reshape(b * n, c), h_scale.reshape(b * n, 1), fc1_p
            )
        else:
            hid = int8_matmul_prequant(hq, h_scale, fc1_p, h.dtype)
    else:
        qkv_out = _linear(h, qkv_p)
        hid = _linear(h, fc1_p)
    # Remat tags: AEConfig.remat_save selects which of these the backward
    # keeps instead of recomputing (jax.checkpoint save_only_these_names).
    # The fused-FFN (int8, scale) pair is inference-only — never under remat.
    qkv_out = checkpoint_name(qkv_out, "qkv_out")
    if not isinstance(hid, tuple):
        hid = checkpoint_name(hid, "ffn_hid")

    # --- attention branch ---
    from vitok_tpu.ops.fused_attention import (
        can_fuse,
        can_fuse_q8,
        fused_qkv_attention,
        fused_qkv_attention_q8,
    )

    # The fused megakernel is an INFERENCE path: under training remat its
    # recompute-backward (custom-vjp re-runs the unfused composition) costs
    # more than it saves — measured 264 vs 243 ms/step at 350M bs32 full
    # remat and 213 vs 208 ms/step under the save-3 policy. Gate on the
    # explicit ``deterministic`` flag (NOT ``drop_path_rng is None`` — the
    # rng is also None in training when drop_path_rate == 0).
    inference = deterministic
    if (
        attn_impl in ("auto", "fused")
        and (inference or attn_impl == "fused")
        and can_fuse(n, c, num_heads)
    ):
        # Small-N fused megakernel: QK-norm + RoPE + masked softmax + PV
        # straight from the flat QKV GEMM output — no 5-D reshape/relayout
        # copies, no HBM-materialized [B, H, N, N] logits (those measured
        # ~40% of the 5B int8 decoder loop in the round-3 xplane trace).
        out_p = blk["attn"]["out"]
        if (
            inference
            and "kernel_int8" in out_p
            and can_fuse_q8(n, c, num_heads)
        ):
            # int8 out-projection: quantize per token INSIDE the kernel
            # epilogue (same recipe as quantize_activation of the bf16
            # output) so the attention result reaches HBM as int8+scales.
            # OPT-IN ONLY (VITOK_Q8_EPILOGUE=1): despite removing ~300 MB
            # of quantize-chain HBM traffic per 5B layer, the interleaved
            # A/B measured it +3.3% slower at the 5B headline and neutral
            # at 350M — the XLA chain overlaps with the DMA-bound kernel
            # (see fused_attention._ENABLE_Q8).
            from vitok_tpu.ops.quant import int8_matmul_prequant

            aq, a_scale = fused_qkv_attention_q8(
                qkv_out,
                blk["attn"]["norm_q"]["scale"],
                blk["attn"]["norm_k"]["scale"],
                rope[0], rope[1],
                patch_mask,
                num_heads=num_heads,
                sliding_window=sliding_window,
            )
            attn = int8_matmul_prequant(aq, a_scale, out_p, h.dtype)
            if "bias" in out_p:
                attn = attn + out_p["bias"].astype(h.dtype)
            attn_projected = True
        else:
            attn = fused_qkv_attention(
                qkv_out,
                blk["attn"]["norm_q"]["scale"],
                blk["attn"]["norm_k"]["scale"],
                rope[0], rope[1],
                patch_mask,
                num_heads=num_heads,
                sliding_window=sliding_window,
                impl="fused",
            )
            attn_projected = False
    else:
        # NOTE: keep the 5-D reshape+index split. Flat last-dim slices look
        # cheaper but measured 13% SLOWER on the 5B int8 forward (three
        # slices break the int8 GEMM's output fusion into separate copies).
        qkv = qkv_out.reshape(b, n, 3, num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = rms_norm(q, blk["attn"]["norm_q"]["scale"])
        k = rms_norm(k, blk["attn"]["norm_k"]["scale"])
        # Params store q/k channels in rotate-half order (converted at load
        # time by utils/params_io.py) so the rotation needs no lane
        # shuffles — the interleaved form profiled at ~45% of GEMM time on
        # the 5B int8 forward. Numerically identical to the reference.
        q, k = apply_rotary_emb(q, k, rope[0], rope[1], convention="half")
        q = checkpoint_name(q, "q_rot")
        k = checkpoint_name(k, "k_rot")
        attn = dot_product_attention(
            q, k, v,
            patch_mask=patch_mask,
            sliding_window=sliding_window,
            # "fused" is a request for the megakernel above; when its gate
            # can't engage (CPU, odd shape) degrade to auto routing.
            impl="auto" if attn_impl == "fused" else attn_impl,
        ).reshape(b, n, c)
        attn_projected = False
    if not attn_projected:
        attn = checkpoint_name(attn, "attn_out")
        attn = _linear(attn, blk["attn"]["out"])

    # --- mlp branch (parallel: reads the same normed input) ---
    fc2_p = blk["ffn"]["fc2"]
    if "kernel_int8" in fc2_p:
        from vitok_tpu.ops.quant import (
            can_fuse_silu_quant,
            fused_silu_quant,
            int8_matmul_prequant,
        )

        if isinstance(hid, tuple):
            # Fused-FFN path: hid is the already-gated, already-quantized
            # (int8 [M, F'], scale [M, 1]) SwiGLU output.
            tq, t_scale = hid
            mlp = int8_matmul_prequant(
                tq, t_scale, fc2_p, h.dtype
            ).reshape(b, n, c)
        elif can_fuse_silu_quant(n):
            # One-pass silu(g)*v + per-token int8 quantize (Pallas): the
            # unfused chain costs two full XLA passes over the fc1 output.
            tq, t_scale = fused_silu_quant(hid)
            mlp = int8_matmul_prequant(tq, t_scale, fc2_p, h.dtype)
        else:
            mv, mg = jnp.split(hid, 2, axis=-1)
            mlp = _linear(jax.nn.silu(mg) * mv, fc2_p)
    else:
        mv, mg = jnp.split(hid, 2, axis=-1)
        mlp = _linear(jax.nn.silu(mg) * mv, fc2_p)

    combined = attn + mlp
    if "layer_scale" in blk:
        combined = layer_scale(combined, blk["layer_scale"]["gamma"])

    # Stochastic depth per sample (train-only; reference drop_path ae.py:15-30).
    if drop_path_rng is not None:
        keep = 1.0 - drop_path_prob
        gate = jnp.floor(
            keep + jax.random.uniform(drop_path_rng, (b, 1, 1), jnp.float32)
        )
        scale = jnp.where(keep > 0.0, 1.0 / jnp.maximum(keep, 1e-8), 0.0)
        combined = combined * (gate * scale).astype(combined.dtype)

    return x + combined


def _run_block_stack(
    x: Array,
    blocks: Params,
    rope: Tuple[Array, Array],
    patch_mask: Optional[Array],
    depth: int,
    *,
    num_heads: int,
    sliding_window: Optional[int],
    attn_impl: str,
    checkpoint: int,
    drop_path_rates: Array,
    rng: Optional[Array],
    remat_save: Tuple[str, ...] = (),
    deterministic: bool = True,
) -> Array:
    """Scan the stacked block params over the sequence.

    ``jax.lax.scan`` gives one compiled block body; with ``checkpoint > 0``
    the body is rematerialized on the backward pass (trades FLOPs for HBM,
    same capability as the reference's every-k-th-block torch checkpointing).
    ``remat_save`` keeps the named intermediates (``qkv_out``/``ffn_hid``/
    ``attn_out``) across the backward instead of recomputing them — the
    big-GEMM outputs are ~70% of the recompute FLOPs, so saving them buys
    most of the reference's k>1 behavior without the structural grouping
    that crashes this TPU tunnel's compile helper.
    """
    rngs = (
        jax.random.split(rng, depth)
        if rng is not None
        else jnp.zeros((depth, 2), jnp.uint32)
    )
    use_drop = rng is not None

    def body(carry: Array, xs) -> Tuple[Array, None]:
        blk, dpr, layer_rng = xs
        out = _block_body(
            carry,
            blk,
            rope,
            patch_mask,
            num_heads=num_heads,
            sliding_window=sliding_window,
            attn_impl=attn_impl,
            drop_path_prob=dpr,
            drop_path_rng=layer_rng if use_drop else None,
            deterministic=deterministic,
        )
        return out, None

    xs = (blocks, drop_path_rates, rngs)

    if checkpoint < 0:
        # Unrolled per-layer bodies: a Python loop over depth. Slicing the
        # stacked params at trace time lets XLA fold the per-layer gathers
        # into their use sites instead of the scan's carried dynamic-slice
        # copies — measured 191 vs ~207 ms grads-only at 350M bs32 (save-3
        # policy) on v5e. Cost: compile time grows with depth (~5 min at
        # 350M on the tunnel's remote compile helper) and the program is
        # depth-specialized.
        #   -1: each layer under jax.checkpoint(policy) — per-layer remat,
        #       same capability as checkpoint=1 otherwise;
        #   -2: NO remat — every residual stored across the backward (the
        #       scan-based checkpoint=0 program crashes this tunnel's
        #       compile helper; the unrolled trace is the working no-remat
        #       path, HBM permitting).
        if checkpoint == -1:
            policy = (
                jax.checkpoint_policies.save_only_these_names(*remat_save)
                if remat_save
                else jax.checkpoint_policies.nothing_saveable
            )
            layer = jax.checkpoint(body, policy=policy)
        else:
            layer = body
        for i in range(depth):
            xi = jax.tree_util.tree_map(lambda a, _i=i: a[_i], xs)
            x, _ = layer(x, xi)
        return x

    if checkpoint > 1:
        # Every-k-th-block checkpointing — the reference's exact granularity
        # (ae.py:159-160: layers with i % k == 0 run under torch.checkpoint,
        # the rest store activations normally). Recompute cost is 1/k of a
        # forward instead of a full forward. A depth not divisible by k
        # leaves a shorter trailing group (still led by a remat'd block, as
        # its index is a multiple of k) rather than degrading to full remat.
        groups = depth // checkpoint
        remainder = depth % checkpoint
        remat_body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.nothing_saveable
        )

        def group_body(carry: Array, group_xs) -> Tuple[Array, None]:
            # The k-1 non-remat'd blocks are unrolled statically: a nested
            # lax.scan under jax.checkpoint inside the outer group scan
            # reliably crashed the TPU compiler (remote_compile HTTP 500).
            k = jax.tree_util.tree_leaves(group_xs)[0].shape[0]
            first = jax.tree_util.tree_map(lambda a: a[0], group_xs)
            carry, _ = remat_body(carry, first)
            for j in range(1, k):
                xj = jax.tree_util.tree_map(lambda a: a[j], group_xs)
                carry, _ = body(carry, xj)
            return carry, None

        head = jax.tree_util.tree_map(lambda a: a[: groups * checkpoint], xs)
        if groups:
            grouped = jax.tree_util.tree_map(
                lambda a: a.reshape((groups, checkpoint) + a.shape[1:]), head
            )
            x, _ = jax.lax.scan(group_body, x, grouped)
        if remainder:
            tail = jax.tree_util.tree_map(
                lambda a: a[groups * checkpoint :], xs
            )
            x, _ = group_body(x, tail)
        return x

    if checkpoint > 0:
        policy = (
            jax.checkpoint_policies.save_only_these_names(*remat_save)
            if remat_save
            else jax.checkpoint_policies.nothing_saveable
        )
        body = jax.checkpoint(body, policy=policy)

    x, _ = jax.lax.scan(body, x, xs)
    return x


def _rope_tables(
    patch_dict: Dict[str, Array], head_dim: int, theta: float
) -> Tuple[Array, Array]:
    """Per-sample 2D RoPE cos/sin in fp32 (reference _get_rope_freqs)."""
    row = patch_dict["row_idx"].astype(jnp.float32)
    col = patch_dict["col_idx"].astype(jnp.float32)
    return compute_2d_freqs_cis(row, col, head_dim, theta)


# Full metadata contract carried through encode/decode outputs — matches the
# reference's passthrough set (vitok/models/ae.py:209-216,236-243) so that
# ``postprocess`` on a decode output keeps the dense grid_rows/grid_cols
# reshape fast path instead of falling into the mask-scan branch.
_META_KEYS = (
    "patch_mask",
    "row_idx",
    "col_idx",
    "time_idx",
    "orig_height",
    "orig_width",
    "grid_rows",
    "grid_cols",
)


def _meta(d: Dict[str, Array]) -> Dict[str, Array]:
    return {k: d[k] for k in _META_KEYS if k in d}


def encode_apply(
    params: Params,
    patch_dict: Dict[str, Array],
    cfg: AEConfig,
    *,
    deterministic: bool = True,
    rng: Optional[Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Dict[str, Array]:
    """Encode a NaFlex patch dict to normalized latents ``z [B, N, c]``."""
    x = patch_dict["patches"].astype(compute_dtype)
    x = _linear(x, params["patch_embed"])
    rope = _rope_tables(patch_dict, cfg.encoder_head_dim, cfg.rope_theta)
    patch_mask = patch_dict.get("patch_mask")
    dpr = jnp.zeros((cfg.encoder_depth,), jnp.float32)  # encoder: no drop path
    x = _run_block_stack(
        x,
        params["encoder_blocks"],
        rope,
        patch_mask,
        cfg.encoder_depth,
        num_heads=cfg.encoder_heads,
        sliding_window=cfg.sw,
        attn_impl=cfg.attn_impl,
        checkpoint=cfg.checkpoint,
        drop_path_rates=dpr,
        # The encoder never drop-paths (reference ae.py:143 ramps the
        # decoder only), so the per-layer RNG + gating multiply would be a
        # no-op — skip it statically.
        rng=None,
        remat_save=cfg.remat_save,
        deterministic=deterministic,
    )
    z = layer_norm(_linear(x, params["to_code"]))
    out = _meta(patch_dict)
    out["z"] = z
    return out


def decode_apply(
    params: Params,
    encode_dict: Dict[str, Array],
    cfg: AEConfig,
    *,
    deterministic: bool = True,
    rng: Optional[Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Dict[str, Array]:
    """Decode latents back to flattened patch pixels."""
    x = encode_dict["z"].astype(compute_dtype)
    x = _linear(x, params["decoder_embed"])
    rope = _rope_tables(encode_dict, cfg.decoder_head_dim, cfg.rope_theta)
    patch_mask = encode_dict.get("patch_mask")
    # Linear drop-path ramp over decoder depth (reference ae.py:143).
    d = cfg.decoder_depth
    dpr = cfg.drop_path_rate * jnp.arange(d, dtype=jnp.float32) / max(d - 1, 1)
    # drop_path_rate == 0.0 makes the stochastic-depth gate exactly 1
    # (floor(1 + u) = 1, scale = 1): skip the per-layer RNG + full-stream
    # gating multiply statically rather than paying it in every block.
    use_drop = (not deterministic) and cfg.drop_path_rate > 0.0
    x = _run_block_stack(
        x,
        params["decoder_blocks"],
        rope,
        patch_mask,
        d,
        num_heads=cfg.decoder_heads,
        sliding_window=cfg.sw,
        attn_impl=cfg.attn_impl,
        checkpoint=cfg.checkpoint,
        drop_path_rates=dpr,
        rng=rng if use_drop else None,
        remat_save=cfg.remat_save,
        deterministic=deterministic,
    )
    out = _meta(encode_dict)
    out["patches"] = _linear(x, params["to_pixels"])
    return out


def forward_apply(
    params: Params,
    patch_dict: Dict[str, Array],
    cfg: AEConfig,
    *,
    deterministic: bool = True,
    rng: Optional[Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Dict[str, Array]:
    """Full forward: encode then decode (whichever halves the config has)."""
    out = patch_dict
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    if cfg.encoder:
        out = encode_apply(
            params, out, cfg,
            deterministic=deterministic, rng=enc_rng, compute_dtype=compute_dtype,
        )
    if cfg.decoder:
        out = decode_apply(
            params, out, cfg,
            deterministic=deterministic, rng=dec_rng, compute_dtype=compute_dtype,
        )
    return out


# ---------------------------------------------------------------------------
# Object API shim (reference-style dict-in/dict-out model object)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _jitted(fn_name: str, cfg: AEConfig, compute_dtype_name: str):
    fn = {"encode": encode_apply, "decode": decode_apply, "forward": forward_apply}[
        fn_name
    ]
    dtype = jnp.dtype(compute_dtype_name)

    def wrapped(params, d):
        return fn(params, d, cfg, deterministic=True, compute_dtype=dtype)

    return jax.jit(wrapped)


class AE:
    """Thin object wrapper mirroring the reference ``AE`` interface.

    Construct with ``AE(**decode_variant("Ld4-Ld24/1x16x64"))`` exactly like
    the reference (unknown kwargs are swallowed). Holds a config and a params
    pytree; ``encode``/``decode``/``__call__`` are jit-compiled and cached per
    input shape.
    """

    def __init__(self, params: Optional[Params] = None, seed: int = 0,
                 param_dtype=jnp.float32, compute_dtype=jnp.bfloat16, **kwargs):
        self.cfg = AEConfig(**_filter_known(kwargs))
        self.compute_dtype = jnp.dtype(compute_dtype)
        if params is None:
            params = init_params(self.cfg, jax.random.key(seed), param_dtype)
        self.params = params

    # -- reference-style properties ------------------------------------
    @property
    def is_encoder(self) -> bool:
        return self.cfg.encoder

    @property
    def is_decoder(self) -> bool:
        return self.cfg.decoder

    @property
    def spatial_stride(self) -> int:
        return self.cfg.spatial_stride

    @property
    def pixels_per_token(self) -> int:
        return self.cfg.pixels_per_token

    @property
    def channels_per_token(self) -> int:
        return self.cfg.channels_per_token

    def _run(self, name: str, d: Dict[str, Array]) -> Dict[str, Array]:
        return _jitted(name, self.cfg, self.compute_dtype.name)(self.params, d)

    def encode(self, patch_dict: Dict[str, Array]) -> Dict[str, Array]:
        return self._run("encode", patch_dict)

    def decode(self, encode_dict: Dict[str, Array]) -> Dict[str, Array]:
        return self._run("decode", encode_dict)

    def __call__(self, patch_dict: Dict[str, Array]) -> Dict[str, Array]:
        return self._run("forward", patch_dict)

    forward = __call__

    def num_params(self) -> int:
        return num_params(self.params)

    def quantize(self) -> "AE":
        """Int8 dynamic-activation/int8-weight quantization per block.

        API parity with the reference's torchao FP8 ``quantize()``
        (ae.py:253-270); idempotent. On v5e the int8 MXU path runs at 2x the
        bf16 rate; quality is gated at SSIM >= 0.99 vs bf16 in tests.
        """
        from vitok_tpu.ops.quant import quantize_block_params

        self.params = quantize_block_params(self.params)
        return self


def Model(**kw) -> AE:
    """Factory alias for parity with the reference (ae.py:273-275)."""
    return AE(**kw)


__all__ = [
    "AE",
    "AEConfig",
    "Model",
    "decode_variant",
    "init_params",
    "num_params",
    "encode_apply",
    "decode_apply",
    "forward_apply",
]
