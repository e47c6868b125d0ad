"""Pallas TPU flash attention with NaFlex patch masking + sliding windows.

This replaces the reference's external ``flash_attn`` CUDA kernel
(``vitok/models/modules/attention.py:109-117`` in Na-VAE/vitok-release) and is
strictly more capable: the reference flash path cannot apply the NaFlex patch
mask (it relies on zero-padded patches being "mostly harmless"), while this
kernel masks key-side padding *exactly* and supports the sliding window at
the same time.

Design (classic online-softmax flash attention, TPU-shaped):

* grid ``(B, H, NQ, NK)`` with the KV axis innermost; Pallas pipelines the
  HBM->VMEM block DMAs across grid steps (double buffering for free),
* fp32 running max / sum / accumulator in VMEM scratch, bf16 GEMMs on the MXU
  with fp32 ``preferred_element_type``,
* **block-level skipping**: per-sample valid-token counts ride in scalar
  prefetch; KV blocks that are entirely tail padding or entirely outside the
  sliding window skip their compute (`@pl.when`),
* fully-masked query rows produce 0 (guarded divide), never NaN.

The public entry ``flash_attention`` pads N to a block multiple, handles
layout, and defines a custom VJP whose backward recomputes attention with the
XLA path — training always runs at small token budgets (N≈256) where the
O(N²) recompute is trivial, while huge-N inference (the 8192p regime,
N≈262k) uses only the forward kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30
_DEFAULT_BLOCK_Q = 256
_DEFAULT_BLOCK_K = 256


def _attn_kernel(
    # scalar prefetch
    valid_ref,  # [B] int32 — number of valid (unmasked) tokens per sample
    # inputs
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BK, D]
    v_ref,  # [1, 1, BK, D]
    mask_ref,  # [1, 1, BK] int32 (1 = valid), key side
    qmask_ref,  # [1, 1, BQ] int32 (1 = valid), query side
    # outputs
    o_ref,  # [1, 1, BQ, D]
    # scratch
    m_ref,  # [BQ, 128] f32
    l_ref,  # [BQ, 128] f32
    acc_ref,  # [BQ, D] f32
    *,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    sliding_window: Optional[int],
    use_mask: bool,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ---- block-level skip decision (cheap scalar math) ----
    valid = valid_ref[b]
    kv_start = ik * block_k
    q_start = iq * block_q
    live = kv_start < valid  # skip pure tail-padding blocks
    if sliding_window is not None:
        # query block covers [q_start, q_start + BQ); kv block intersects the
        # window [q_start - sw, q_start + BQ - 1 + sw] ?
        live = jnp.logical_and(live, kv_start <= q_start + block_q - 1 + sliding_window)
        live = jnp.logical_and(live, kv_start + block_k - 1 >= q_start - sliding_window)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]  # [BQ, D]
        k = k_ref[0, 0]  # [BK, D]
        v = v_ref[0, 0]
        d = q.shape[-1]
        scale = 1.0 / (d ** 0.5)

        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BK]

        # ---- within-block masking ----
        neg = jnp.float32(_NEG_INF)
        if use_mask:
            kv_valid = mask_ref[0, 0, :] > 0  # [BK]
            s = jnp.where(kv_valid[None, :], s, neg)
        if sliding_window is not None:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            in_window = jnp.abs(q_pos - k_pos) <= sliding_window
            s = jnp.where(in_window, s, neg)

        m_prev = m_ref[:, :1]  # [BQ, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # exp of fully-masked rows: m_new stays NEG_INF -> s - m_new = 0
        # would give p = 1; guard by flushing to 0 when row is dead.
        row_dead = m_new <= jnp.float32(_NEG_INF / 2)
        p = jnp.exp(s - m_new)
        p = jnp.where(row_dead | (s <= jnp.float32(_NEG_INF / 2)), 0.0, p)

        alpha = jnp.exp(m_prev - m_new)
        alpha = jnp.where(row_dead, 0.0, alpha)

        l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, D]
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out = acc_ref[...] / safe_l
        if use_mask:
            # f32 multiplicative mask: Mosaic can't add a minor dim to i1
            # vectors, so cast before the reshape.
            q_valid = (qmask_ref[0, 0, :] > 0).astype(jnp.float32)  # [BQ]
            out = out * q_valid[:, None]
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _flash_fwd(
    q: Array,
    k: Array,
    v: Array,
    patch_mask: Optional[Array],
    sliding_window: Optional[int],
    block_q: int,
    block_k: int,
    interpret: bool,
) -> Array:
    """Forward kernel. q, k, v: [B, N, H, D] -> out [B, N, H, D]."""
    b, n, h, d = q.shape
    out_dtype = v.dtype

    # Pad token axis to a block multiple; padded tokens are masked out.
    n_pad = -n % max(block_q, block_k)
    if patch_mask is None:
        mask = jnp.ones((b, n), jnp.int32)
    else:
        mask = patch_mask.astype(jnp.int32)
    if n_pad:
        pad = [(0, 0), (0, n_pad), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, n_pad)])
    np_ = n + n_pad

    # [B, N, H, D] -> [B, H, N, D] for clean (token, head_dim) blocking.
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    # NaFlex padding is a tail suffix, so the number of leading valid tokens
    # bounds the live KV range. (With an arbitrary mask this is still exact —
    # it's just less of a skip.)
    # Token padding must be masked even when the caller passed no mask.
    has_mask = patch_mask is not None or n_pad > 0
    if patch_mask is not None:
        # Live KV range = highest valid index + 1 (exact for any mask; for the
        # NaFlex tail-suffix layout it equals the valid count).
        valid = jnp.max(
            jnp.where(mask > 0, jnp.arange(np_, dtype=jnp.int32)[None, :] + 1, 0),
            axis=-1,
        )
    else:
        valid = jnp.full((b,), n, jnp.int32)

    num_q_blocks = np_ // block_q
    num_kv_blocks = np_ // block_k

    kernel = functools.partial(
        _attn_kernel,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        sliding_window=sliding_window,
        use_mask=has_mask,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, iq, ik, valid: (b_, h_, iq, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda b_, h_, iq, ik, valid: (b_, h_, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda b_, h_, iq, ik, valid: (b_, h_, ik, 0)
            ),
            pl.BlockSpec((1, 1, block_k), lambda b_, h_, iq, ik, valid: (b_, 0, ik)),
            pl.BlockSpec((1, 1, block_q), lambda b_, h_, iq, ik, valid: (b_, 0, iq)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, iq, ik, valid: (b_, h_, iq, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, np_, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(valid, qt, kt, vt, mask[:, None, :], mask[:, None, :])

    out = out.transpose(0, 2, 1, 3)  # back to [B, N, H, D]
    if n_pad:
        out = out[:, :n]
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _flash_attention_core(
    q, k, v, has_mask, sliding_window, block_q, block_k, interpret, patch_mask
):
    return _flash_fwd(
        q, k, v,
        patch_mask if has_mask else None,
        sliding_window, block_q, block_k, interpret,
    )


def _core_fwd(q, k, v, has_mask, sliding_window, block_q, block_k, interpret, patch_mask):
    out = _flash_attention_core(
        q, k, v, has_mask, sliding_window, block_q, block_k, interpret, patch_mask
    )
    return out, (q, k, v, patch_mask)


def _core_bwd(has_mask, sliding_window, block_q, block_k, interpret, residuals, g):
    """Backward via XLA recompute (training runs at small N; see module doc)."""
    from vitok_tpu.ops.attention import _xla_attention, make_attention_mask

    q, k, v, patch_mask = residuals
    n = q.shape[1]
    mask = make_attention_mask(patch_mask if has_mask else None, n, sliding_window)

    def f(q_, k_, v_):
        return _xla_attention(q_, k_, v_, mask)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    patch_mask: Optional[Array] = None,
    sliding_window: Optional[int] = None,
    block_q: int = _DEFAULT_BLOCK_Q,
    block_k: int = _DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> Array:
    """Flash attention over NaFlex token sequences.

    Args:
        q, k, v: ``[B, N, H, D]``.
        patch_mask: optional ``[B, N]`` bool/int, nonzero = valid token.
        sliding_window: optional half-width (|i - j| <= sw attends).
        block_q, block_k: tile sizes (auto-shrunk for short sequences).
        interpret: force Pallas interpreter mode (default: on for non-TPU
            backends so CPU tests exercise the same kernel).

    Returns:
        ``[B, N, H, D]`` attention output in v's dtype.
    """
    b, n, h, d = q.shape
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(n, 128))
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    dummy_mask = patch_mask if patch_mask is not None else jnp.ones((b, n), jnp.int32)
    return _flash_attention_core(
        q, k, v,
        patch_mask is not None,
        sliding_window,
        block_q,
        block_k,
        interpret,
        dummy_mask,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


__all__ = ["flash_attention"]
