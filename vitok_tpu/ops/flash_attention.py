"""Pallas TPU flash attention with NaFlex patch masking + sliding windows.

This replaces the reference's external ``flash_attn`` CUDA kernel
(``vitok/models/modules/attention.py:109-117`` in Na-VAE/vitok-release) and is
strictly more capable: the reference flash path cannot apply the NaFlex patch
mask (it relies on zero-padded patches being "mostly harmless"), while this
kernel masks key-side padding *exactly* and supports the sliding window at
the same time.

Design (online-softmax flash attention, shaped for TPU's grid/DMA model):

* grid ``(B, NQ, NK)`` — **all heads are processed inside one grid cell**
  (a ``fori_loop`` over H against one KV block held in VMEM). Per-cell DMA
  issue latency is the dominant cost at high resolution; folding H cuts the
  cell count by the head count and fetches each KV block once per query
  block instead of once per (head, query block),
* under sliding-window attention the KV grid axis spans only the window:
  the BlockSpec index maps compute the global KV block as ``base(iq) + ik``,
  so out-of-window blocks are never fetched at all,
* fp32 running max / sum / accumulator in VMEM scratch; bf16 GEMMs on the
  MXU with fp32 accumulation,
* interior blocks (fully valid, fully in-window) skip the mask lattice
  entirely; only boundary blocks pay for iota/select,
* per-sample valid-token counts ride in scalar prefetch to skip
  tail-padding KV blocks; fully-masked query rows produce 0, never NaN.

The public entry ``flash_attention`` pads N to a block multiple, handles
layout, and defines a custom VJP. Above ``_BWD_PALLAS_THRESHOLD`` tokens the
backward is a pair of Pallas flash kernels (dq and dk/dv) with the same
mask + sliding-window semantics and block-skip geometry as the forward: the
forward saves the per-row log-sum-exp, the backward recomputes
``p = exp(s - lse)`` tile by tile and accumulates gradients in fp32 VMEM
scratch, so training memory stays O(block²) instead of O(N²) at any
resolution (measured 2.2x faster / 2.5x leaner than the chunked XLA
recompute at 16k tokens on v5e). At small N the XLA full-recompute vjp is
used instead — it measures faster there and skips a pathological XLA
compile of the fused program. See ``_BWD_IMPL``.
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
_DEFAULT_BLOCK_K = 512


def _window_base(iq, block_q, block_k, sw, total_kv_blocks, nk_local):
    """First KV block of the window for query block ``iq`` (clamped).

    Shared by the kernel and the BlockSpec index maps so both compute the
    same global block index.
    """
    lo = (iq * block_q - sw) // block_k  # floor toward -inf
    return jnp.clip(lo, 0, total_kv_blocks - nk_local)


def _attn_kernel(
    # scalar prefetch
    valid_ref,  # [B] int32 — number of valid (leading) tokens per sample
    # inputs
    q_ref,  # [1, H, BQ, D]
    k_ref,  # [1, H, BK, D]
    v_ref,  # [1, H, BK, D]
    mask_ref,  # [1, 1, BK] int32 (1 = valid), key side
    qmask_ref,  # [1, 1, BQ] int32 (1 = valid), query side
    # outputs
    o_ref,  # [1, H, BQ, D]
    # [lse_ref] when return_lse: [1, H, BQ, 1] f32 — then scratch
    *rest,
    num_heads: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,       # size of the kv grid axis (window blocks if SWA)
    total_kv_blocks: int,     # full number of kv blocks in the array
    sliding_window: Optional[int],
    use_mask: bool,
    return_lse: bool,
):
    if return_lse:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        lse_ref = None
        m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ---- block-level geometry (cheap scalar math) ----
    valid = valid_ref[b]
    q_start = iq * block_q
    if sliding_window is not None:
        base = _window_base(
            iq, block_q, block_k, sliding_window, total_kv_blocks, num_kv_blocks
        )
        kv_start = (base + ik) * block_k
    else:
        kv_start = ik * block_k

    live = kv_start < valid  # skip pure tail-padding blocks
    if sliding_window is not None:
        live = jnp.logical_and(
            live, kv_start <= q_start + block_q - 1 + sliding_window
        )
        live = jnp.logical_and(
            live, kv_start + block_k - 1 >= q_start - sliding_window
        )

    # "easy" = no element-level masking needed anywhere in the block.
    easy = kv_start + block_k <= valid
    if sliding_window is not None:
        easy = jnp.logical_and(
            easy, kv_start >= q_start + block_q - 1 - sliding_window
        )
        easy = jnp.logical_and(
            easy, kv_start + block_k - 1 <= q_start + sliding_window
        )

    def _window_lattice():
        q_pos = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = kv_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        return jnp.abs(q_pos - k_pos) <= sliding_window

    def _accumulate(masked: bool):
        neg = jnp.float32(_NEG_INF)
        window = _window_lattice() if (masked and sliding_window is not None) else None
        kv_valid = (mask_ref[0, 0, :] > 0) if (masked and use_mask) else None

        def head_body(h, _):
            q = q_ref[0, h]  # [BQ, D]
            k = k_ref[0, h]  # [BK, D]
            v = v_ref[0, h]
            d = q.shape[-1]
            qs = (q.astype(jnp.float32) * (1.0 / (d ** 0.5))).astype(q.dtype)

            s = jax.lax.dot_general(
                qs, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            if kv_valid is not None:
                s = jnp.where(kv_valid[None, :], s, neg)
            if window is not None:
                s = jnp.where(window, s, neg)

            m_prev = m_ref[h, :, :1]  # [BQ, 1]
            l_prev = l_ref[h, :, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            if masked:
                row_dead = m_new <= jnp.float32(_NEG_INF / 2)
                p = jnp.where(
                    row_dead | (s <= jnp.float32(_NEG_INF / 2)), 0.0, p
                )
                alpha = jnp.where(row_dead, 0.0, alpha)

            l_ref[h, :, :1] = l_prev * alpha + jnp.sum(
                p, axis=-1, keepdims=True
            )
            m_ref[h, :, :1] = m_new
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, D]
            acc_ref[h] = acc_ref[h] * alpha + pv
            return 0

        jax.lax.fori_loop(0, num_heads, head_body, 0)

    @pl.when(jnp.logical_and(live, easy))
    def _fast():
        _accumulate(masked=False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(easy)))
    def _edge():
        _accumulate(masked=True)

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        if use_mask:
            q_valid = (qmask_ref[0, 0, :] > 0).astype(jnp.float32)  # [BQ]

        def head_out(h, _):
            l = l_ref[h, :, :1]
            safe_l = jnp.where(l == 0.0, 1.0, l)
            out = acc_ref[h] / safe_l
            if use_mask:
                # f32 multiplicative mask: Mosaic can't add a minor dim to
                # i1 vectors, so cast before the reshape.
                out = out * q_valid[:, None]
            o_ref[0, h] = out.astype(o_ref.dtype)
            if lse_ref is not None:
                # Dead rows (no live keys) get +BIG so the backward's
                # exp(s - lse) is exactly 0 for them.
                m = m_ref[h, :, :1]
                lse_ref[0, h] = jnp.where(
                    l > 0.0, m + jnp.log(safe_l), jnp.float32(-_NEG_INF)
                )
            return 0

        jax.lax.fori_loop(0, num_heads, head_out, 0)


def _flash_fwd(
    q: Array,
    k: Array,
    v: Array,
    patch_mask: Optional[Array],
    sliding_window: Optional[int],
    block_q: int,
    block_k: int,
    interpret: bool,
    return_lse: bool = False,
):
    """Forward kernel. q, k, v: [B, N, H, D] -> out [B, N, H, D].

    With ``return_lse`` also returns the padded-length log-sum-exp
    ``[B, H, N_pad, 1]`` f32 (backward residual)."""
    b, n, h, d = q.shape
    out_dtype = v.dtype

    # Pad the token axis so it divides BOTH block sizes (max() is not enough
    # when the clamped blocks aren't multiples of each other — a short pad
    # would silently drop trailing query blocks). Padding is masked out.
    import math as _math

    n_pad = -n % _math.lcm(block_q, block_k)
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
    total_kv_blocks = np_ // block_k
    if sliding_window is not None:
        # KV grid axis spans only the window: no DMA or grid steps are spent
        # on out-of-window blocks (the dominant cost at high resolution).
        nk_local = min(
            total_kv_blocks,
            (block_q + 2 * sliding_window) // block_k + 2,
        )
    else:
        nk_local = total_kv_blocks

    # Heads are processed in VMEM-sized chunks per grid cell.
    head_chunk = h
    while head_chunk > 8 or h % head_chunk:
        head_chunk -= 1

    kernel = functools.partial(
        _attn_kernel,
        num_heads=head_chunk,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=nk_local,
        total_kv_blocks=total_kv_blocks,
        sliding_window=sliding_window,
        use_mask=has_mask,
        return_lse=return_lse,
    )

    if sliding_window is not None:
        sw_ = sliding_window

        def kv_map(b_, hg, iq, ik, valid):
            base = _window_base(
                iq, block_q, block_k, sw_, total_kv_blocks, nk_local
            )
            return (b_, hg, base + ik, 0)

        def kv_mask_map(b_, hg, iq, ik, valid):
            base = _window_base(
                iq, block_q, block_k, sw_, total_kv_blocks, nk_local
            )
            return (b_, 0, base + ik)
    else:
        kv_map = lambda b_, hg, iq, ik, valid: (b_, hg, ik, 0)
        kv_mask_map = lambda b_, hg, iq, ik, valid: (b_, 0, ik)

    in_specs = [
        pl.BlockSpec(
            (1, head_chunk, block_q, d),
            lambda b_, hg, iq, ik, valid: (b_, hg, iq, 0),
        ),
        pl.BlockSpec((1, head_chunk, block_k, d), kv_map),
        pl.BlockSpec((1, head_chunk, block_k, d), kv_map),
        pl.BlockSpec((1, 1, block_k), kv_mask_map),
        pl.BlockSpec(
            (1, 1, block_q), lambda b_, hg, iq, ik, valid: (b_, 0, iq)
        ),
    ]
    o_spec = pl.BlockSpec(
        (1, head_chunk, block_q, d),
        lambda b_, hg, iq, ik, valid: (b_, hg, iq, 0),
    )
    o_shape = jax.ShapeDtypeStruct((b, h, np_, d), out_dtype)
    if return_lse:
        out_specs = (
            o_spec,
            pl.BlockSpec(
                (1, head_chunk, block_q, 1),
                lambda b_, hg, iq, ik, valid: (b_, hg, iq, 0),
            ),
        )
        out_shape = (o_shape, jax.ShapeDtypeStruct((b, h, np_, 1), jnp.float32))
    else:
        out_specs = o_spec
        out_shape = o_shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h // head_chunk, num_q_blocks, nk_local),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((head_chunk, block_q, 128), jnp.float32),
            pltpu.VMEM((head_chunk, block_q, 128), jnp.float32),
            pltpu.VMEM((head_chunk, block_q, d), jnp.float32),
        ],
    )

    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
        interpret=interpret,
    )(valid, qt, kt, vt, mask[:, None, :], mask[:, None, :])

    out, lse = res if return_lse else (res, None)
    out = out.transpose(0, 2, 1, 3)  # back to [B, N, H, D]
    if n_pad:
        out = out[:, :n]
    if return_lse:
        return out, lse
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
    out, lse = _flash_fwd(
        q, k, v,
        patch_mask if has_mask else None,
        sliding_window, block_q, block_k, interpret,
        return_lse=True,
    )
    return out, (q, k, v, patch_mask, out, lse)


# Backward implementation:
# * "auto" (default): XLA full-recompute vjp at small N (faster there —
#   measured 5.3 ms vs 9.8 ms/step at N=256 b=64 h=12 on v5e — and avoids
#   a minutes-long XLA compile of the fused grad program), flash dq/dkv
#   Pallas kernels above _BWD_PALLAS_THRESHOLD tokens (2.2x faster and
#   2.5x leaner than the q-chunked recompute at N=16384),
# * "pallas": always the flash kernels,
# * "xla": always recompute (full vjp below _BWD_CHUNK_THRESHOLD tokens,
#   q-chunked above, keeping transient logits O(chunk * N)).
_BWD_IMPL = "auto"
_BWD_PALLAS_THRESHOLD = 2048
_BWD_CHUNK_THRESHOLD = 2048
_BWD_Q_CHUNK = 512


def _dq_kernel(
    # scalar prefetch
    valid_ref,  # [B] int32
    # inputs
    q_ref,  # [1, H, BQ, D]
    k_ref,  # [1, H, BK, D]
    v_ref,  # [1, H, BK, D]
    g_ref,  # [1, H, BQ, D]   dL/dout (query-masked)
    o_ref,  # [1, H, BQ, D]   forward output
    lse_ref,  # [1, H, BQ, 1] f32
    mask_ref,  # [1, 1, BK] int32, key side
    # outputs
    dq_ref,  # [1, H, BQ, D]
    # scratch
    dq_acc,  # [H, BQ, D] f32
    *,
    num_heads: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    total_kv_blocks: int,
    sliding_window: Optional[int],
    use_mask: bool,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    valid = valid_ref[b]
    q_start = iq * block_q
    if sliding_window is not None:
        base = _window_base(
            iq, block_q, block_k, sliding_window, total_kv_blocks, num_kv_blocks
        )
        kv_start = (base + ik) * block_k
    else:
        kv_start = ik * block_k

    live = kv_start < valid
    if sliding_window is not None:
        live = jnp.logical_and(
            live, kv_start <= q_start + block_q - 1 + sliding_window
        )
        live = jnp.logical_and(
            live, kv_start + block_k - 1 >= q_start - sliding_window
        )

    easy = kv_start + block_k <= valid
    if sliding_window is not None:
        easy = jnp.logical_and(
            easy, kv_start >= q_start + block_q - 1 - sliding_window
        )
        easy = jnp.logical_and(
            easy, kv_start + block_k - 1 <= q_start + sliding_window
        )

    def _accumulate(masked: bool):
        if masked and sliding_window is not None:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            window = jnp.abs(q_pos - k_pos) <= sliding_window
        else:
            window = None
        kv_valid = (mask_ref[0, 0, :] > 0) if (masked and use_mask) else None

        def head_body(h, _):
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            do = g_ref[0, h]
            d = q.shape[-1]
            scale = 1.0 / (d ** 0.5)
            qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

            s = jax.lax.dot_general(
                qs, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            p = jnp.exp(s - lse_ref[0, h])  # lse: [BQ, 1] broadcast
            if kv_valid is not None:
                p = jnp.where(kv_valid[None, :], p, 0.0)
            if window is not None:
                p = jnp.where(window, p, 0.0)

            dp = jax.lax.dot_general(
                do, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            delta = jnp.sum(
                do.astype(jnp.float32) * o_ref[0, h].astype(jnp.float32),
                axis=-1, keepdims=True,
            )  # [BQ, 1]
            ds = p * (dp - delta)
            dq_acc[h] += scale * jax.lax.dot_general(
                ds.astype(k.dtype), k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, num_heads, head_body, 0)

    @pl.when(jnp.logical_and(live, easy))
    def _fast():
        _accumulate(masked=False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(easy)))
    def _edge():
        _accumulate(masked=True)

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        def head_out(h, _):
            dq_ref[0, h] = dq_acc[h].astype(dq_ref.dtype)
            return 0

        jax.lax.fori_loop(0, num_heads, head_out, 0)


def _dkv_kernel(
    # scalar prefetch
    valid_ref,  # [B] int32
    # inputs
    k_ref,  # [1, H, BK, D]
    v_ref,  # [1, H, BK, D]
    q_ref,  # [1, H, BQ, D]
    g_ref,  # [1, H, BQ, D]
    o_ref,  # [1, H, BQ, D]
    lse_ref,  # [1, H, BQ, 1] f32
    mask_ref,  # [1, 1, BK] int32 — this kernel's own KV block
    # outputs
    dk_ref,  # [1, H, BK, D]
    dv_ref,  # [1, H, BK, D]
    # scratch
    dk_acc,  # [H, BK, D] f32
    dv_acc,  # [H, BK, D] f32
    *,
    num_heads: int,
    block_q: int,
    block_k: int,
    num_q_blocks: int,        # size of the q grid axis (window blocks if SWA)
    total_q_blocks: int,
    sliding_window: Optional[int],
    use_mask: bool,
):
    b = pl.program_id(0)
    ik = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    valid = valid_ref[b]
    kv_start = ik * block_k
    if sliding_window is not None:
        base = _window_base(
            ik, block_k, block_q, sliding_window, total_q_blocks, num_q_blocks
        )
        q_start = (base + iq) * block_q
    else:
        q_start = iq * block_q

    # Query rows past `valid` carry zero cotangent (g is query-masked), so
    # they can be skipped outright; so can whole out-of-window q blocks.
    live = jnp.logical_and(q_start < valid, kv_start < valid)
    if sliding_window is not None:
        live = jnp.logical_and(
            live, kv_start <= q_start + block_q - 1 + sliding_window
        )
        live = jnp.logical_and(
            live, kv_start + block_k - 1 >= q_start - sliding_window
        )

    easy = kv_start + block_k <= valid
    if sliding_window is not None:
        easy = jnp.logical_and(
            easy, kv_start >= q_start + block_q - 1 - sliding_window
        )
        easy = jnp.logical_and(
            easy, kv_start + block_k - 1 <= q_start + sliding_window
        )

    def _accumulate(masked: bool):
        # Everything stays in [BQ, BK] orientation; dk/dv come out of
        # dot_generals that contract the query (sublane) axis — no
        # in-kernel transposes of the lse/delta vectors.
        if masked and sliding_window is not None:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            window = jnp.abs(q_pos - k_pos) <= sliding_window
        else:
            window = None
        kv_valid = (mask_ref[0, 0, :] > 0) if (masked and use_mask) else None

        def head_body(h, _):
            k = k_ref[0, h]
            v = v_ref[0, h]
            q = q_ref[0, h]
            do = g_ref[0, h]
            d = q.shape[-1]
            scale = 1.0 / (d ** 0.5)
            qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

            s = jax.lax.dot_general(
                qs, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            p = jnp.exp(s - lse_ref[0, h])
            if kv_valid is not None:
                p = jnp.where(kv_valid[None, :], p, 0.0)
            if window is not None:
                p = jnp.where(window, p, 0.0)

            dv_acc[h] += jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # contract BQ -> [BK, D]
            dp = jax.lax.dot_general(
                do, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            delta = jnp.sum(
                do.astype(jnp.float32) * o_ref[0, h].astype(jnp.float32),
                axis=-1, keepdims=True,
            )  # [BQ, 1]
            ds = p * (dp - delta)
            dk_acc[h] += scale * jax.lax.dot_general(
                ds.astype(q.dtype), q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # contract BQ -> [BK, D]
            return 0

        jax.lax.fori_loop(0, num_heads, head_body, 0)

    @pl.when(jnp.logical_and(live, easy))
    def _fast():
        _accumulate(masked=False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(easy)))
    def _edge():
        _accumulate(masked=True)

    @pl.when(iq == num_q_blocks - 1)
    def _finalize():
        def head_out(h, _):
            dk_ref[0, h] = dk_acc[h].astype(dk_ref.dtype)
            dv_ref[0, h] = dv_acc[h].astype(dv_ref.dtype)
            return 0

        jax.lax.fori_loop(0, num_heads, head_out, 0)


def _flash_bwd(
    q, k, v, patch_mask, out, lse, g,
    sliding_window, block_q, block_k, interpret,
):
    """Pallas flash backward: (dq, dk, dv) with the forward's semantics.

    ``lse`` is the forward's padded-length ``[B, H, N_pad, 1]`` f32 residual.
    """
    import math as _math

    b, n, h, d = q.shape
    n_pad = -n % _math.lcm(block_q, block_k)
    np_ = n + n_pad
    assert lse.shape == (b, h, np_, 1), (lse.shape, (b, h, np_, 1))

    if patch_mask is None:
        mask = jnp.ones((b, n), jnp.int32)
    else:
        mask = patch_mask.astype(jnp.int32)
        # The forward zeroes invalid query rows, so their cotangent must not
        # flow into the recomputed attention.
        g = g * mask[..., None, None].astype(g.dtype)
    if n_pad:
        pad = [(0, 0), (0, n_pad), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        g = jnp.pad(g, pad)
        out = jnp.pad(out, pad)
        mask = jnp.pad(mask, [(0, 0), (0, n_pad)])

    has_mask = patch_mask is not None or n_pad > 0
    if patch_mask is not None:
        valid = jnp.max(
            jnp.where(mask > 0, jnp.arange(np_, dtype=jnp.int32)[None, :] + 1, 0),
            axis=-1,
        )
    else:
        valid = jnp.full((b,), n, jnp.int32)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    gt = g.transpose(0, 2, 1, 3)
    ot = out.transpose(0, 2, 1, 3)
    mask3 = mask[:, None, :]

    num_q_blocks = np_ // block_q
    total_kv_blocks = np_ // block_k
    if sliding_window is not None:
        nk_local = min(
            total_kv_blocks, (block_q + 2 * sliding_window) // block_k + 2
        )
        nq_local = min(
            num_q_blocks, (block_k + 2 * sliding_window) // block_q + 2
        )
    else:
        nk_local = total_kv_blocks
        nq_local = num_q_blocks

    head_chunk = h
    while head_chunk > 8 or h % head_chunk:
        head_chunk -= 1

    sem = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )

    # ---- dq: grid over query blocks, KV axis innermost (window-clipped) ----
    if sliding_window is not None:
        sw_ = sliding_window

        def kv_map(b_, hg, iq, ik, valid):
            base = _window_base(
                iq, block_q, block_k, sw_, total_kv_blocks, nk_local
            )
            return (b_, hg, base + ik, 0)

        def kv_mask_map(b_, hg, iq, ik, valid):
            base = _window_base(
                iq, block_q, block_k, sw_, total_kv_blocks, nk_local
            )
            return (b_, 0, base + ik)
    else:
        kv_map = lambda b_, hg, iq, ik, valid: (b_, hg, ik, 0)
        kv_mask_map = lambda b_, hg, iq, ik, valid: (b_, 0, ik)

    q_map = lambda b_, hg, iq, ik, valid: (b_, hg, iq, 0)
    lse_q_map = lambda b_, hg, iq, ik, valid: (b_, hg, iq, 0)

    dq_kernel = functools.partial(
        _dq_kernel,
        num_heads=head_chunk,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=nk_local,
        total_kv_blocks=total_kv_blocks,
        sliding_window=sliding_window,
        use_mask=has_mask,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // head_chunk, num_q_blocks, nk_local),
            in_specs=[
                pl.BlockSpec((1, head_chunk, block_q, d), q_map),
                pl.BlockSpec((1, head_chunk, block_k, d), kv_map),
                pl.BlockSpec((1, head_chunk, block_k, d), kv_map),
                pl.BlockSpec((1, head_chunk, block_q, d), q_map),
                pl.BlockSpec((1, head_chunk, block_q, d), q_map),
                pl.BlockSpec((1, head_chunk, block_q, 1), lse_q_map),
                pl.BlockSpec((1, 1, block_k), kv_mask_map),
            ],
            out_specs=pl.BlockSpec((1, head_chunk, block_q, d), q_map),
            scratch_shapes=[
                pltpu.VMEM((head_chunk, block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, np_, d), q.dtype),
        compiler_params=sem,
        interpret=interpret,
    )(valid, qt, kt, vt, gt, ot, lse, mask3)

    # ---- dk/dv: grid over KV blocks, query axis innermost (clipped) ----
    if sliding_window is not None:
        sw_ = sliding_window

        def q_map_b(b_, hg, ik, iq, valid):
            base = _window_base(
                ik, block_k, block_q, sw_, num_q_blocks, nq_local
            )
            return (b_, hg, base + iq, 0)
    else:
        q_map_b = lambda b_, hg, ik, iq, valid: (b_, hg, iq, 0)

    kv_self_map = lambda b_, hg, ik, iq, valid: (b_, hg, ik, 0)

    dkv_kernel = functools.partial(
        _dkv_kernel,
        num_heads=head_chunk,
        block_q=block_q,
        block_k=block_k,
        num_q_blocks=nq_local,
        total_q_blocks=num_q_blocks,
        sliding_window=sliding_window,
        use_mask=has_mask,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // head_chunk, total_kv_blocks, nq_local),
            in_specs=[
                pl.BlockSpec((1, head_chunk, block_k, d), kv_self_map),
                pl.BlockSpec((1, head_chunk, block_k, d), kv_self_map),
                pl.BlockSpec((1, head_chunk, block_q, d), q_map_b),
                pl.BlockSpec((1, head_chunk, block_q, d), q_map_b),
                pl.BlockSpec((1, head_chunk, block_q, d), q_map_b),
                pl.BlockSpec((1, head_chunk, block_q, 1), q_map_b),
                pl.BlockSpec(
                    (1, 1, block_k),
                    lambda b_, hg, ik, iq, valid: (b_, 0, ik),
                ),
            ],
            out_specs=(
                pl.BlockSpec((1, head_chunk, block_k, d), kv_self_map),
                pl.BlockSpec((1, head_chunk, block_k, d), kv_self_map),
            ),
            scratch_shapes=[
                pltpu.VMEM((head_chunk, block_k, d), jnp.float32),
                pltpu.VMEM((head_chunk, block_k, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, np_, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, np_, d), v.dtype),
        ),
        compiler_params=sem,
        interpret=interpret,
    )(valid, kt, vt, qt, gt, ot, lse, mask3)

    dq = dq.transpose(0, 2, 1, 3)[:, :n]
    dk = dk.transpose(0, 2, 1, 3)[:, :n]
    dv = dv.transpose(0, 2, 1, 3)[:, :n]
    return dq, dk, dv


def _core_bwd(has_mask, sliding_window, block_q, block_k, interpret, residuals, g):
    """Backward pass.

    Default (``_BWD_IMPL == "pallas"``): flash dq/dkv kernels reusing the
    forward's saved log-sum-exp — O(block²) transient memory at any N.

    XLA fallback: small N gets one full attention vjp; large N is chunked
    over query blocks with remat — each chunk's logits are materialized and
    differentiated independently (no carry between q chunks), bounding
    memory at O(q_chunk * N) per step. dk/dv accumulate across chunks in
    fp32.
    """
    from vitok_tpu.ops.attention import _xla_attention, make_attention_mask

    q, k, v, patch_mask, out, lse = residuals
    b, n, h, d = q.shape
    pm = patch_mask if has_mask else None

    use_pallas = _BWD_IMPL == "pallas" or (
        _BWD_IMPL == "auto" and n > _BWD_PALLAS_THRESHOLD
    )
    if use_pallas:
        dq, dk, dv = _flash_bwd(
            q, k, v, pm, out, lse, g,
            sliding_window, block_q, block_k, interpret,
        )
        return dq, dk, dv, None

    if n <= _BWD_CHUNK_THRESHOLD:
        mask = make_attention_mask(pm, n, sliding_window)

        def f(q_, k_, v_):
            return _xla_attention(q_, k_, v_, mask)

        _, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None

    qc = _BWD_Q_CHUNK
    n_pad = -n % qc
    if n_pad:
        pad4 = [(0, 0), (0, n_pad), (0, 0), (0, 0)]
        q_p = jnp.pad(q, pad4)
        g_p = jnp.pad(g, pad4)
    else:
        q_p, g_p = q, g
    np_ = n + n_pad
    n_chunks = np_ // qc

    key_valid = (
        pm.astype(bool) if pm is not None else jnp.ones((b, n), bool)
    )
    q_positions = jnp.arange(np_).reshape(n_chunks, qc)

    @functools.partial(
        jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable
    )
    def chunk_grads(q_chunk, g_chunk, q_pos, k_, v_):
        """(dq_chunk, dk_contrib, dv_contrib) for one query block."""
        # [1|B, 1, qc, N] mask: key validity + window + query-in-range.
        mask = key_valid[:, None, None, :]
        if sliding_window is not None:
            window = (
                jnp.abs(q_pos[:, None] - jnp.arange(n)[None, :])
                <= sliding_window
            )
            mask = mask & window[None, None]
        mask = mask & (q_pos < n)[None, None, :, None]

        def f(q_, k2, v2):
            return _xla_attention(q_, k2, v2, mask)

        out, vjp = jax.vjp(f, q_chunk, k_, v_)
        dq_c, dk_c, dv_c = vjp(g_chunk)
        return dq_c, dk_c.astype(jnp.float32), dv_c.astype(jnp.float32)

    def scan_body(carry, xs):
        dk_acc, dv_acc = carry
        q_chunk, g_chunk, q_pos = xs
        dq_c, dk_c, dv_c = chunk_grads(q_chunk, g_chunk, q_pos, k, v)
        return (dk_acc + dk_c, dv_acc + dv_c), dq_c

    zeros = jnp.zeros((b, n, h, d), jnp.float32)
    q_chunks = q_p.reshape(b, n_chunks, qc, h, d).transpose(1, 0, 2, 3, 4)
    g_chunks = g_p.reshape(b, n_chunks, qc, h, d).transpose(1, 0, 2, 3, 4)
    (dk, dv), dq_chunks = jax.lax.scan(
        scan_body, (zeros, zeros), (q_chunks, g_chunks, q_positions)
    )
    dq = dq_chunks.transpose(1, 0, 2, 3, 4).reshape(b, np_, h, d)[:, :n]
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


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
