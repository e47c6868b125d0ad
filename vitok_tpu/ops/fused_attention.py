"""Fused small-N attention megakernel (QK-norm + 2D-RoPE + softmax + PV).

Why this exists: at NaFlex budgets (256-1024 tokens) the XLA attention path
materializes the fp32 ``[B, H, N, N]`` logits in HBM and surrounds the
per-head split with layout copies; on the 5B int8 forward those ops measure
~40% of decoder-loop time (xplane trace, round 3). The flash kernel in
``flash_attention.py`` is built for huge N and is grid-latency-bound here.

This kernel is shaped for the small-N regime instead:

* **input is the raw fused-QKV GEMM output** ``[B, N, 3C]`` — no 5-D
  reshape, no head-split relayout copies. Three BlockSpecs view the same
  array at lane offsets ``0 / C / 2C`` (block index = plane offset in
  ``C_g``-sized units),
* per (batch, head-group) grid cell the whole token axis lives in VMEM:
  QK RMSNorm (fp32 stats), rotate-half RoPE, masked fp32 softmax and the
  PV matmul all happen without touching HBM,
* output is the flat ``[B, N, C]`` attention result, ready for the output
  projection GEMM.

Numerics follow the unfused composition exactly (same dtype recipe:
fp32 norm stats -> bf16 cast -> bf16 rotation -> fp32 logits/softmax ->
bf16 PV operand -> fp32 accumulation), so this is a drop-in replacement for
``rms_norm + apply_rotary_emb + dot_product_attention(impl="xla")`` in
``models/ae.py::_block_body`` — capability parity with the reference's
attention module (``vitok/models/modules/attention.py`` in
Na-VAE/vitok-release) with NaFlex masking the reference's flash path lacks.

The op is differentiable via ``jax.custom_vjp``. When the shape allows
(``can_fuse_bwd``) the backward is a second Pallas kernel with the same
grid/plane layout that recomputes the forward in VMEM (norm, RoPE, probs)
and backpropagates through PV/softmax/QK^T, the rotation, and the RMSNorm
— producing the flat ``[B, N, 3C]`` qkv gradient without ever
materializing ``[B, H, N, N]`` logits in HBM (the XLA recompute backward
writes four of those per layer). Outside that envelope the backward falls
back to recomputing the unfused composition and reusing its VJP.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30
_RMS_EPS = 1e-6
# Max fused-path token count: full-N scores must fit VMEM comfortably.
MAX_FUSED_TOKENS = 1024
# Per-cell VMEM budget steering the head-group size (bytes). The model
# ``16*n*cg`` (2x-buffered bf16 q/k/v/out blocks + fp32 norm temps) plus
# ``10*n*n`` (fp32 scores + exp + bf16 probs) predicted the observed
# Mosaic stack usage within ~5% on hardware; 13MB leaves headroom under
# the 16MB scoped-vmem limit.
_VMEM_BUDGET = 13 * 1024 * 1024


def _vmem_estimate(n: int, cg: int) -> int:
    return 16 * n * cg + 10 * n * n


# Backward working set: q/k/v/do in + dq/dk/dv out blocks (2x-buffered
# bf16) plus three concurrent fp32 [N, N] temps (probs, dp, ds).
def _vmem_estimate_bwd(n: int, cg: int) -> int:
    return 28 * n * cg + 16 * n * n


def _pick_group_channels(
    c: int, d: int, n: int, lane_align: bool = True, estimate=_vmem_estimate
) -> int:
    """Largest per-group channel count that divides C, is a multiple of the
    head dim AND the 128-lane tile, and keeps the kernel's working set
    under the VMEM budget. Returns 0 if no valid group size exists.
    ``lane_align=False`` (interpreter mode) drops the 128-lane requirement.
    """
    best = 0
    cg = d
    while cg <= c:
        if c % cg == 0 and (cg % 128 == 0 or not lane_align):
            if best == 0 and estimate is _vmem_estimate:
                # Forward: always accept the smallest valid group (its
                # working set is dominated by the N*N scores, which no
                # group choice can shrink).
                best = cg
            elif estimate(n, cg) <= _VMEM_BUDGET and (
                estimate is not _vmem_estimate or cg < c or c == d
            ):
                # Forward: never collapse to a single head group (hg=1
                # serializes the grid — Mosaic can only overlap DMAs
                # across grid cells). Measured at the 5B shape (c=3072,
                # n=256): cg=1536 runs 1.57 ms/layer vs 1.89 at cg=3072
                # and 2.63 at cg=128.
                best = cg
        cg += d
    if estimate is _vmem_estimate and n <= 64 and best > 4 * d:
        # Small-N regime (the f32 patch-32 family: 64 tokens @256p): the
        # per-head score/PV matmuls are tiny, so the largest-group choice
        # serializes a long per-head chain inside few cells. The measured
        # sweep at the 5B f32 decoder shape (c=3072, d=128, n=64, b=256;
        # reproduce: `python benchmarks/ab_batch_block.py --c 3072
        # --heads 24 --tokens 64 --batch 256 --dtype float32 --layers 256`)
        # has its optimum at cg=4*d: 2.29 (cg=512) / 2.33 (384) / 2.52
        # (256) / 2.56 (768) vs 3.66 ms/call at the large-group pick
        # (cg=1536, −37%) and 4.47 at cg=d. The override is gated on the
        # exact measured geometry — cg == 4*d must be a valid (divides C,
        # lane-aligned, < C) group size — so shapes the sweep never
        # covered (e.g. d=64 models where 4*d=256 doesn't divide C and
        # the fallback would land near the slow cg=d regime) keep the
        # measured-safe large-group rule. n=256+ keeps the large-group
        # rule (measured above); 64<n<256 is unswept and conservatively
        # stays large-group too.
        cand = 4 * d
        if cand < c and c % cand == 0 and (cand % 128 == 0 or not lane_align):
            best = cand
    return best


def _norm_rope_half(x, scale, cos_b, sin_b):
    """fp32 RMSNorm -> input-dtype cast -> rotate-half RoPE (bf16 math).

    Mirrors ``ops.norms.rms_norm`` + ``ops.rope.apply_rotary_emb`` with
    ``convention="half"`` bit-for-bit: stats in fp32, rotation in x.dtype.
    """
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + _RMS_EPS) * scale  # scale: [1, D]
    yb = y.astype(x.dtype)
    d2 = yb.shape[-1] // 2
    xr, xi = yb[:, :d2], yb[:, d2:]
    return jnp.concatenate(
        [xr * cos_b - xi * sin_b, xr * sin_b + xi * cos_b], axis=-1
    )


_PACK_W = 128  # packed-path slab width: one full VPU lane tile


def _pack_constants(d: int, scale, cos_b, sin_b, dtype):
    """Constant operands for the packed norm+RoPE over a 128-lane slab
    holding ``128 // d`` heads (d in {64, 128}).

    Returns ``(scale_w [1, W] f32, cos_ext [N, W], sin_sgn [N, W],
    s_mat [W, W] f32)`` where ``s_mat`` is the block-diagonal segment-sum
    matrix (``W//d`` all-ones D x D blocks) that computes each head's
    sum(x^2) on the MXU instead of a cross-lane VPU reduction.
    """
    w = _PACK_W
    reps = w // d
    li = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    s_mat = ((li // d) == (lj // d)).astype(jnp.float32)
    scale_w = jnp.concatenate([scale] * reps, axis=-1)  # [1, W] f32
    # Rotate-half tables over the slab: per D-segment the lane layout is
    # [xr (D/2) | xi (D/2)]; cos multiplies in place, sin multiplies the
    # half-swapped value with sign [-,+].
    cos_ext = jnp.concatenate([cos_b, cos_b] * reps, axis=-1)
    sin_sgn = jnp.concatenate([-sin_b, sin_b] * reps, axis=-1)
    return scale_w, cos_ext.astype(dtype), sin_sgn.astype(dtype), s_mat


def _norm_rope_packed(x, scale_w, cos_ext, sin_sgn, s_mat, d: int,
                      _var_dot=None):
    """Full-width RMSNorm + rotate-half RoPE over a 128-lane head slab.

    Matches ``_norm_rope_half`` per head up to the variance reduction: the
    per-head sum(x^2) runs as TWO DEFAULT-precision (single-pass bf16)
    matmuls on an exact hi/lo split of x^2 against the block-ones segment
    matrix, carrying ~2^-17 relative error on the variance — below the
    bf16 grid of the kernel's output, so the rotated result agrees with
    the per-head path within bf16 rounding (not bit-identical). The
    half-swap IS an exact permutation matmul. Exists because the per-head
    path costs either half-idle VPU lanes (d=64 — measured ~48% of the
    350M decoder loop, BASELINE_NOTE.md round 3) or log-tree cross-lane
    reductions and half-lane slice/concat shuffles (d=128).
    """
    x32 = x.astype(jnp.float32)
    # Per-head sum(x^2) as TWO default-precision (1-pass bf16) matmuls on an
    # exact hi/lo split of x^2: hi = bf16(x^2), lo = x^2 - hi (exact in f32,
    # and itself bf16-representable to ~2^-17 relative). The 0/1 segment
    # matrix is exact in bf16, so the summed product carries ~2^-17 relative
    # error on the variance — far below the bf16 output grid. The previous
    # HIGHEST-precision form (6-pass bf16 emulation; Mosaic supports only
    # DEFAULT/HIGHEST) was ~half the megakernel's per-cell MXU work at d=64.
    x2 = x32 * x32
    x2_hi = x2.astype(jnp.bfloat16).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    if _var_dot is None:  # test hook: emulate the TPU bf16 DEFAULT dot on CPU
        _var_dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
    # [N, W]: each lane holds its head's sum(x^2)
    seg = _var_dot(x2_hi, s_mat) + _var_dot(x2 - x2_hi, s_mat)
    y = x32 * jax.lax.rsqrt(seg / d + _RMS_EPS) * scale_w
    yb = y.astype(x.dtype)
    d2 = d // 2
    # Half-swap within each D-segment ([xr|xi] -> [xi|xr]) as an exact
    # permutation matmul (one nonzero per column -> bit-exact copy).
    w = _PACK_W
    li = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    perm = ((li // d) == (lj // d)) & ((lj % d) == ((li + d2) % d))
    ysw = jax.lax.dot_general(
        yb, perm.astype(yb.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return yb * cos_ext + ysw * sin_sgn


def _attend_cell(
    qmask_ref,  # [1, 1, N] int32 (1 = valid) — key/query validity
    cos_ref,    # [1, N, D//2] in the activation dtype
    sin_ref,    # [1, N, D//2] in the activation dtype
    qs_ref,     # [1, D] f32 — q-norm scale
    ks_ref,     # [1, D] f32 — k-norm scale
    q_ref,      # [1, N, C_g] — q plane slice of the qkv GEMM output
    k_ref,      # [1, N, C_g]
    v_ref,      # [1, N, C_g]
    write,      # callback: write(sl: slice, value [N, |sl|] in out dtype)
    *,
    heads_per_group: int,
    head_dim: int,
    sliding_window: Optional[int],
    use_mask: bool,
    out_dtype,
):
    """One (batch, head-group) cell: norm + RoPE + attention per head slab.

    Shared between the bf16-out kernel (writes straight to its output
    block) and the int8-epilogue kernel (writes to a VMEM accumulator).
    """
    n = q_ref.shape[1]
    d = head_dim
    inv_sqrt_d = 1.0 / (d ** 0.5)

    qs = qs_ref[:, :].astype(jnp.float32)  # [1, D] — keep vectors 2-D
    ks = ks_ref[:, :].astype(jnp.float32)
    # Tables arrive pre-cast to the activation dtype (the rotation runs in
    # that dtype anyway — apply_rotary_emb semantics) — halves their DMA.
    cos_b = cos_ref[0]
    sin_b = sin_ref[0]

    if use_mask:
        kv_valid = qmask_ref[0, :, :] > 0  # [1, N]
    if sliding_window is not None:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        in_window = jnp.abs(q_pos - k_pos) <= sliding_window

    # d == 64 routes norm+RoPE through 128-lane packed slabs: the
    # elementwise chains run full-width and the per-head reductions/
    # half-swaps move to the MXU (see _norm_rope_packed). d == 128 stays
    # on the per-head path: its packed variant (identical code, one head
    # per slab) crashes this tunnel's remote TPU compile helper
    # (HTTP 500), and its elementwise chains are already full-width.
    packed = d == 64 and (heads_per_group * d) % _PACK_W == 0
    if packed:
        qconst = _pack_constants(d, qs, cos_b, sin_b, q_ref.dtype)
        kconst = _pack_constants(d, ks, cos_b, sin_b, k_ref.dtype)

    # softmax(s/sqrt(d)) == exp2((s * c) - rowmax(s * c)) row-normalized
    # with c = log2(e)/sqrt(d): folding log2e into the existing score scale
    # saves one [N, N] VPU pass per head (XLA lowers exp as exp2(x*log2e)
    # anyway), and the row normalization moves from the [N, N] probs to the
    # [N, D] output (another full-width pass saved).
    score_scale = jnp.float32(inv_sqrt_d * 1.4426950408889634)

    def _attend_one(q, k, vh):
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * score_scale  # [N, N] f32, in log2 units
        if use_mask:
            s = jnp.where(kv_valid, s, jnp.float32(_NEG_INF))
        if sliding_window is not None:
            s = jnp.where(in_window, s, jnp.float32(_NEG_INF))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, D] f32, unnormalized
        return o / l

    if packed:
        for si in range((heads_per_group * d) // _PACK_W):
            sl2 = slice(si * _PACK_W, (si + 1) * _PACK_W)
            q2 = _norm_rope_packed(q_ref[0, :, sl2], *qconst, d)
            k2 = _norm_rope_packed(k_ref[0, :, sl2], *kconst, d)
            v2 = v_ref[0, :, sl2]
            if d == _PACK_W:  # one head fills the slab
                o = _attend_one(q2, k2, v2)
                write(sl2, o.astype(out_dtype))
            else:  # two d=64 heads per slab
                o1 = _attend_one(q2[:, :d], k2[:, :d], v2[:, :d])
                o2 = _attend_one(q2[:, d:], k2[:, d:], v2[:, d:])
                write(sl2, jnp.concatenate([o1, o2], axis=-1).astype(out_dtype))
    else:
        for h in range(heads_per_group):
            sl = slice(h * d, (h + 1) * d)
            q = _norm_rope_half(q_ref[0, :, sl], qs, cos_b, sin_b)
            k = _norm_rope_half(k_ref[0, :, sl], ks, cos_b, sin_b)
            o = _attend_one(q, k, v_ref[0, :, sl])
            write(sl, o.astype(out_dtype))


def _fused_kernel(
    qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
    o_ref,  # [1, N, C_g]
    *,
    heads_per_group: int,
    head_dim: int,
    sliding_window: Optional[int],
    use_mask: bool,
):
    def write(sl, val):
        o_ref[0, :, sl] = val

    _attend_cell(
        qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
        write,
        heads_per_group=heads_per_group,
        head_dim=head_dim,
        sliding_window=sliding_window,
        use_mask=use_mask,
        out_dtype=o_ref.dtype,
    )


def _fused_kernel_q8(
    qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
    oq_ref,   # [1, N, C] int8 — full-width block, revisited across groups
    os_ref,   # [1, N, 1] f32 per-token scales
    acc_ref,  # VMEM scratch [HG, N, C_g] in the activation dtype
    *,
    heads_per_group: int,
    head_dim: int,
    sliding_window: Optional[int],
    use_mask: bool,
    hg: int,
):
    """Megakernel forward with a per-token int8 quantize epilogue.

    Per-token symmetric quantization needs the absmax over the FULL channel
    axis, but each grid cell only computes one head-group slab — so slabs
    accumulate in a VMEM scratch (the head-group grid dim runs sequentially
    on a TPU core) and the LAST group's cell quantizes the whole [N, C] row
    block and writes int8 + scales. Same recipe as
    ``quantize_activation(megakernel_output)`` — slab values stored in the
    activation dtype before the fp32 absmax/round — so codes agree to at
    most one quantization step (separate compilations may move values near
    rounding boundaries by 1 ULP).

    Saves the output projection's separate quantize chain — at the 5B
    256-token decoder shape the bf16 write + absmax read + rescale
    read/write is ~300 MB of HBM traffic per layer (batch 64) that this
    epilogue removes entirely.
    """
    g = pl.program_id(1)
    cg = heads_per_group * head_dim

    def write(sl, val):
        acc_ref[g, :, sl] = val

    _attend_cell(
        qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
        write,
        heads_per_group=heads_per_group,
        head_dim=head_dim,
        sliding_window=sliding_window,
        use_mask=use_mask,
        out_dtype=acc_ref.dtype,
    )

    @pl.when(g == hg - 1)
    def _quantize_epilogue():
        amax = jnp.max(
            jnp.abs(acc_ref[0].astype(jnp.float32)), axis=-1, keepdims=True
        )
        for gg in range(1, hg):
            amax = jnp.maximum(
                amax,
                jnp.max(
                    jnp.abs(acc_ref[gg].astype(jnp.float32)),
                    axis=-1, keepdims=True,
                ),
            )
        scale = jnp.maximum(amax / 127.0, 1e-12)  # [N, 1]
        os_ref[0] = scale
        for gg in range(hg):
            x32 = acc_ref[gg].astype(jnp.float32)
            oq_ref[0, :, gg * cg:(gg + 1) * cg] = jnp.clip(
                jnp.round(x32 / scale), -127, 127
            ).astype(jnp.int8)


def _fused_fwd(
    qkv: Array,
    q_scale: Array,
    k_scale: Array,
    cos: Array,
    sin: Array,
    patch_mask: Optional[Array],
    num_heads: int,
    sliding_window: Optional[int],
    interpret: bool,
) -> Array:
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    cg = _pick_group_channels(c, d, n, lane_align=not interpret)
    if d == 64 and cg == d and c % (2 * d) == 0:
        cg = 2 * d  # pair d=64 heads per 128-lane slab (see _norm_rope_slab)
    hg = c // cg  # head groups

    if patch_mask is None:
        mask = jnp.ones((b, n), jnp.int32)
        use_mask = False
    else:
        mask = patch_mask.astype(jnp.int32)
        use_mask = True

    kernel = functools.partial(
        _fused_kernel,
        heads_per_group=cg // d,
        head_dim=d,
        sliding_window=sliding_window,
        use_mask=use_mask,
    )

    d2 = d // 2
    in_specs = [
        pl.BlockSpec((1, 1, n), lambda bb, g: (bb, 0, 0)),    # mask
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # cos
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # sin
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # q scale
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # k scale
        # q / k / v planes: same array, lane offsets 0 / C / 2C in C_g units.
        pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g)),
        pl.BlockSpec((1, n, cg), lambda bb, g, _hg=hg: (bb, 0, _hg + g)),
        pl.BlockSpec((1, n, cg), lambda bb, g, _hg=hg: (bb, 0, 2 * _hg + g)),
    ]
    out_spec = pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g))

    return pl.pallas_call(
        kernel,
        grid=(b, hg),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        mask[:, None, :],
        cos.astype(qkv.dtype),
        sin.astype(qkv.dtype),
        q_scale.reshape(1, d),
        k_scale.reshape(1, d),
        qkv, qkv, qkv,
    )


def _vmem_estimate_q8(n: int, cg: int, c: int) -> int:
    # Forward working set plus the [HG, N, C_g] accumulator (activation
    # dtype, HG*C_g == C) and the revisited int8 [N, C] output block.
    return 16 * n * cg + 10 * n * n + 3 * n * c


def _pick_group_channels_q8(c: int, d: int, n: int, lane_align: bool = True) -> int:
    """Group size for the int8-epilogue kernel: same rules as the forward
    (divides C, head- and lane-aligned, >= 2 groups) but the accumulator
    must also fit, so the budget is a hard gate — returns 0 when the shape
    can't host the epilogue (fall back to the bf16 kernel + XLA quant)."""
    best = 0
    cg = d
    while cg <= c:
        if (
            c % cg == 0
            and (cg % 128 == 0 or not lane_align)
            and _vmem_estimate_q8(n, cg, c) <= _VMEM_BUDGET
            and (cg < c or c == d)
        ):
            best = cg
        cg += d
    return best


def _fused_fwd_q8(
    qkv: Array,
    q_scale: Array,
    k_scale: Array,
    cos: Array,
    sin: Array,
    patch_mask: Optional[Array],
    num_heads: int,
    sliding_window: Optional[int],
    interpret: bool,
) -> Tuple[Array, Array]:
    """Forward + per-token int8 quantize epilogue.

    Returns ``(q_int8 [B, N, C], scale [B, N, 1] f32)`` ready for
    ``ops.quant.int8_matmul_prequant`` — the attention output never reaches
    HBM in bf16. Inference-only (no VJP); callers gate on ``can_fuse_q8``.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    cg = _pick_group_channels_q8(c, d, n, lane_align=not interpret)
    if d == 64 and cg == d and c % (2 * d) == 0:
        cg = 2 * d  # pair d=64 heads per 128-lane slab (see _norm_rope_packed)
    hg = c // cg

    if patch_mask is None:
        mask = jnp.ones((b, n), jnp.int32)
        use_mask = False
    else:
        mask = patch_mask.astype(jnp.int32)
        use_mask = True

    kernel = functools.partial(
        _fused_kernel_q8,
        heads_per_group=cg // d,
        head_dim=d,
        sliding_window=sliding_window,
        use_mask=use_mask,
        hg=hg,
    )

    d2 = d // 2
    in_specs = [
        pl.BlockSpec((1, 1, n), lambda bb, g: (bb, 0, 0)),    # mask
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # cos
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # sin
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # q scale
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # k scale
        pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g)),
        pl.BlockSpec((1, n, cg), lambda bb, g, _hg=hg: (bb, 0, _hg + g)),
        pl.BlockSpec((1, n, cg), lambda bb, g, _hg=hg: (bb, 0, 2 * _hg + g)),
    ]
    out_specs = (
        pl.BlockSpec((1, n, c), lambda bb, g: (bb, 0, 0)),
        pl.BlockSpec((1, n, 1), lambda bb, g: (bb, 0, 0)),
    )

    return pl.pallas_call(
        kernel,
        # The head-group dim accumulates into scratch and quantizes on its
        # last step — it must run in order ("arbitrary"), not be split.
        grid=(b, hg),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), jnp.int8),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((hg, n, cg), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        mask[:, None, :],
        cos.astype(qkv.dtype),
        sin.astype(qkv.dtype),
        q_scale.reshape(1, d),
        k_scale.reshape(1, d),
        qkv, qkv, qkv,
    )


# The int8 quantize epilogue is OFF by default: interleaved A/B on the real
# chip (benchmarks/ab_q8_epilogue.py, round 4) measured it +3.3% SLOWER on
# the 5B int8 headline (9.47 vs 9.17 ms/img) and neutral (-0.3%, noise) on
# 350M @256p — the separate XLA quantize chain overlaps with the DMA-bound
# megakernel, while the in-kernel epilogue adds critical-path VPU work.
# Kept as an opt-in lever (VITOK_Q8_EPILOGUE=1) and for future non-DMA-bound
# shapes; numerics are parity-tested in tests/test_fused_attention.py.
_ENABLE_Q8 = os.environ.get("VITOK_Q8_EPILOGUE", "0") not in ("", "0")


def can_fuse_q8(n: int, c: int, num_heads: int) -> bool:
    """Whether the int8-epilogue forward supports this shape (the [N, C]
    accumulator + int8 output block tighten the VMEM envelope). Also gated
    on the opt-in ``VITOK_Q8_EPILOGUE`` flag — measured slower in situ on
    the DMA-bound headline shapes (see ``_ENABLE_Q8``)."""
    if not _ENABLE_Q8:
        return False
    d = c // num_heads
    return (
        _backend_is_tpu()
        and n <= MAX_FUSED_TOKENS
        and n % 8 == 0
        and c % num_heads == 0
        and d % 64 == 0
        and _pick_group_channels_q8(c, d, n) > 0
    )


def fused_qkv_attention_q8(
    qkv: Array,
    q_scale: Array,
    k_scale: Array,
    cos: Array,
    sin: Array,
    patch_mask: Optional[Array] = None,
    *,
    num_heads: int,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """``fused_qkv_attention`` + per-token int8 quantize in one kernel.

    Inference-only (not differentiable): the int8 output feeds the output
    projection's ``int8_matmul_prequant`` directly, eliminating the
    separate XLA quantize chain over the bf16 attention output. Quantized
    values match ``quantize_activation(fused_output)`` within one step.
    """
    return _fused_fwd_q8(
        qkv, q_scale, k_scale, cos, sin, patch_mask,
        num_heads, sliding_window, interpret=interpret,
    )


def _rotate_half_bwd(dz, cos32, sin32):
    """Transpose of the rotate-half rotation (f32): dz [N, D] -> dy [N, D]."""
    d2 = dz.shape[-1] // 2
    dzr, dzi = dz[:, :d2], dz[:, d2:]
    dyr = dzr * cos32 + dzi * sin32
    dyi = -dzr * sin32 + dzi * cos32
    return jnp.concatenate([dyr, dyi], axis=-1)


def _fused_bwd_kernel(
    qmask_ref,  # [1, 1, N] int32
    cos_ref,    # [1, N, D//2] activation dtype
    sin_ref,    # [1, N, D//2]
    qs_ref,     # [1, D] f32
    ks_ref,     # [1, D] f32
    q_ref,      # [1, N, C_g]
    k_ref,      # [1, N, C_g]
    v_ref,      # [1, N, C_g]
    do_ref,     # [1, N, C_g]
    dq_ref,     # [1, N, C_g] out
    dk_ref,     # [1, N, C_g] out
    dv_ref,     # [1, N, C_g] out
    dsc_ref,    # [1, 1, 8, D] f32 out — row 0: dq_scale partial, row 1:
                # dk_scale partial, rows 2-7 zero (8-row pad for TPU tiling)
    *,
    heads_per_group: int,
    head_dim: int,
    sliding_window: Optional[int],
    use_mask: bool,
):
    """Backward of the fused op: recompute probs in VMEM, backprop through
    PV / softmax / QK^T, the rotation, and the fp32 RMSNorm. No [N, N]
    tensor ever reaches HBM."""
    n = q_ref.shape[1]
    d = head_dim
    inv_sqrt_d = 1.0 / (d ** 0.5)

    qs = qs_ref[:, :].astype(jnp.float32)  # [1, D]
    ks = ks_ref[:, :].astype(jnp.float32)
    cos_b = cos_ref[0]
    sin_b = sin_ref[0]
    cos32 = cos_b.astype(jnp.float32)
    sin32 = sin_b.astype(jnp.float32)

    if use_mask:
        kv_valid = qmask_ref[0, :, :] > 0  # [1, N]
    if sliding_window is not None:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        in_window = jnp.abs(q_pos - k_pos) <= sliding_window

    dqs_acc = jnp.zeros((1, d), jnp.float32)
    dks_acc = jnp.zeros((1, d), jnp.float32)

    for h in range(heads_per_group):
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, sl]  # [N, D]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        doh = do_ref[0, :, sl]

        # --- forward recompute (same math as _fused_kernel) ---
        q32 = qh.astype(jnp.float32)
        k32 = kh.astype(jnp.float32)
        rq = jax.lax.rsqrt(
            jnp.mean(q32 * q32, axis=-1, keepdims=True) + _RMS_EPS
        )  # [N, 1]
        rk = jax.lax.rsqrt(
            jnp.mean(k32 * k32, axis=-1, keepdims=True) + _RMS_EPS
        )
        yq = q32 * rq * qs           # [N, D] f32 (pre-cast normed q)
        yk = k32 * rk * ks
        yqb = yq.astype(qh.dtype)
        ykb = yk.astype(kh.dtype)
        d2 = d // 2
        qrot = jnp.concatenate(
            [yqb[:, :d2] * cos_b - yqb[:, d2:] * sin_b,
             yqb[:, :d2] * sin_b + yqb[:, d2:] * cos_b], axis=-1
        )
        krot = jnp.concatenate(
            [ykb[:, :d2] * cos_b - ykb[:, d2:] * sin_b,
             ykb[:, :d2] * sin_b + ykb[:, d2:] * cos_b], axis=-1
        )

        s = jax.lax.dot_general(
            qrot, krot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d
        if use_mask:
            s = jnp.where(kv_valid, s, jnp.float32(_NEG_INF))
        if sliding_window is not None:
            s = jnp.where(in_window, s, jnp.float32(_NEG_INF))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # [N, N] f32

        # --- backward ---
        dv = jax.lax.dot_general(
            p.astype(vh.dtype), doh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, D]
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            doh, vh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, N]
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)  # [N, 1]
        ds = p * (dp - delta) * inv_sqrt_d

        dsb = ds.astype(qrot.dtype)
        dqrot = jax.lax.dot_general(
            dsb, krot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, D]
        dkrot = jax.lax.dot_general(
            dsb, qrot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dyq = _rotate_half_bwd(dqrot, cos32, sin32)  # [N, D] f32
        dyk = _rotate_half_bwd(dkrot, cos32, sin32)

        # RMSNorm backward: y = x * r * scale, r = rsqrt(mean(x^2) + eps)
        # dscale = sum_n dy * x * r
        # dx = dy * scale * r - x * r^3/D * sum_d(dy * scale * x)
        dqs_acc += jnp.sum(dyq * q32 * rq, axis=0, keepdims=True)
        dks_acc += jnp.sum(dyk * k32 * rk, axis=0, keepdims=True)
        gq = dyq * qs  # dy * scale
        gk = dyk * ks
        dq = gq * rq - q32 * (rq * rq * rq / d) * jnp.sum(
            gq * q32, axis=-1, keepdims=True
        )
        dk = gk * rk - k32 * (rk * rk * rk / d) * jnp.sum(
            gk * k32, axis=-1, keepdims=True
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)

    dsc_ref[0, 0] = jnp.concatenate(
        [dqs_acc, dks_acc, jnp.zeros((6, d), jnp.float32)], axis=0
    )


def _fused_bwd(
    qkv: Array,
    q_scale: Array,
    k_scale: Array,
    cos: Array,
    sin: Array,
    patch_mask: Optional[Array],
    do: Array,
    num_heads: int,
    sliding_window: Optional[int],
    interpret: bool,
):
    """Pallas backward: returns (dqkv [B,N,3C], dq_scale [D], dk_scale [D])."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    cg = _pick_group_channels(
        c, d, n, lane_align=not interpret, estimate=_vmem_estimate_bwd
    )
    hg = c // cg

    if patch_mask is None:
        mask = jnp.ones((b, n), jnp.int32)
        use_mask = False
    else:
        mask = patch_mask.astype(jnp.int32)
        use_mask = True

    kernel = functools.partial(
        _fused_bwd_kernel,
        heads_per_group=cg // d,
        head_dim=d,
        sliding_window=sliding_window,
        use_mask=use_mask,
    )

    d2 = d // 2
    in_specs = [
        pl.BlockSpec((1, 1, n), lambda bb, g: (bb, 0, 0)),    # mask
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # cos
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # sin
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # q scale
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # k scale
        pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g)),   # q plane
        pl.BlockSpec((1, n, cg), lambda bb, g, _hg=hg: (bb, 0, _hg + g)),
        pl.BlockSpec((1, n, cg), lambda bb, g, _hg=hg: (bb, 0, 2 * _hg + g)),
        pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g)),   # do
    ]
    out_specs = [
        pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g)),   # dq
        pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g)),   # dk
        pl.BlockSpec((1, n, cg), lambda bb, g: (bb, 0, g)),   # dv
        pl.BlockSpec((1, 1, 8, d), lambda bb, g: (bb, g, 0, 0)),  # scales
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        jax.ShapeDtypeStruct((b, hg, 8, d), jnp.float32),
    ]

    dq, dk, dv, dsc_p = pl.pallas_call(
        kernel,
        grid=(b, hg),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        mask[:, None, :],
        cos.astype(qkv.dtype),
        sin.astype(qkv.dtype),
        q_scale.reshape(1, d).astype(jnp.float32),
        k_scale.reshape(1, d).astype(jnp.float32),
        qkv, qkv, qkv, do,
    )
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    dqs = jnp.sum(dsc_p[:, :, 0], axis=(0, 1)).astype(q_scale.dtype)
    dks = jnp.sum(dsc_p[:, :, 1], axis=(0, 1)).astype(k_scale.dtype)
    return dqkv, dqs, dks


def can_fuse_bwd(n: int, c: int, num_heads: int) -> bool:
    """Whether the Pallas backward kernel supports this shape (stricter VMEM
    envelope than the forward: three concurrent fp32 [N, N] temps)."""
    d = c // num_heads
    return (
        _backend_is_tpu()
        and n <= MAX_FUSED_TOKENS
        and n % 8 == 0
        and c % num_heads == 0
        and d % 64 == 0
        and _pick_group_channels(c, d, n, estimate=_vmem_estimate_bwd) > 0
    )


def unfused_qkv_attention(
    qkv: Array,
    q_scale: Array,
    k_scale: Array,
    cos: Array,
    sin: Array,
    patch_mask: Optional[Array],
    num_heads: int,
    sliding_window: Optional[int],
    attn_impl: str = "auto",
) -> Array:
    """The exact unfused composition the kernel replaces (and its VJP)."""
    from vitok_tpu.ops.attention import dot_product_attention
    from vitok_tpu.ops.norms import rms_norm
    from vitok_tpu.ops.rope import apply_rotary_emb

    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    qkv5 = qkv.reshape(b, n, 3, num_heads, d)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
    q = rms_norm(q, q_scale)
    k = rms_norm(k, k_scale)
    q, k = apply_rotary_emb(q, k, cos, sin, convention="half")
    out = dot_product_attention(
        q, k, v,
        patch_mask=patch_mask,
        sliding_window=sliding_window,
        impl=attn_impl,
    )
    return out.reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_op(qkv, q_scale, k_scale, cos, sin, patch_mask,
              num_heads, sliding_window):
    return _fused_fwd(
        qkv, q_scale, k_scale, cos, sin, patch_mask,
        num_heads, sliding_window, interpret=False,
    )


def _fused_op_fwd(qkv, q_scale, k_scale, cos, sin, patch_mask,
                  num_heads, sliding_window):
    out = _fused_op(
        qkv, q_scale, k_scale, cos, sin, patch_mask,
        num_heads, sliding_window,
    )
    return out, (qkv, q_scale, k_scale, cos, sin, patch_mask)


def _fused_op_bwd(num_heads, sliding_window, res, g):
    qkv, q_scale, k_scale, cos, sin, patch_mask = res
    b, n, c3 = qkv.shape
    c = c3 // 3
    if patch_mask is not None:
        # Dead-query cotangents are exactly zero in the model (padding
        # never reaches the loss: attention masks it key-side, everything
        # else is per-token). Zeroing them here makes the Pallas kernel
        # (key-side mask) and the unfused fallback (two-sided mask) agree
        # bit-for-bit at every position instead of only on valid tokens.
        g = g * patch_mask.astype(g.dtype)[..., None]
    if can_fuse_bwd(n, c, num_heads):
        # Pallas backward: probs recomputed in VMEM, no [B, H, N, N]
        # HBM materialization. cos/sin come from integer grid indices and
        # have no upstream diff path, so their cotangents are zeros.
        dqkv, dqs, dks = _fused_bwd(
            qkv, q_scale, k_scale, cos, sin, patch_mask, g,
            num_heads, sliding_window, interpret=False,
        )
        return (dqkv, dqs, dks,
                jnp.zeros_like(cos), jnp.zeros_like(sin), None)

    # Fallback: recompute the unfused composition and reuse its VJP.
    def f(qkv_, qs_, ks_, cos_, sin_):
        return unfused_qkv_attention(
            qkv_, qs_, ks_, cos_, sin_, patch_mask,
            num_heads, sliding_window, attn_impl="xla",
        )

    _, vjp = jax.vjp(f, qkv, q_scale, k_scale, cos, sin)
    dqkv, dqs, dks, dcos, dsin = vjp(g)
    return dqkv, dqs, dks, dcos, dsin, None


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def _backend_is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover — defensive
        return False


def can_fuse(n: int, c: int, num_heads: int) -> bool:
    """Whether the fused small-N kernel supports this shape on this backend."""
    d = c // num_heads
    return (
        _backend_is_tpu()
        and n <= MAX_FUSED_TOKENS
        and n % 8 == 0
        and c % num_heads == 0
        and d % 64 == 0
        and _pick_group_channels(c, d, n) > 0
    )


def fused_qkv_attention(
    qkv: Array,
    q_scale: Array,
    k_scale: Array,
    cos: Array,
    sin: Array,
    patch_mask: Optional[Array] = None,
    *,
    num_heads: int,
    sliding_window: Optional[int] = None,
    impl: str = "auto",
    interpret: bool = False,
) -> Array:
    """QK-norm + rotate-half RoPE + masked attention from flat QKV.

    Args:
        qkv: ``[B, N, 3C]`` fused QKV projection output (q/k/v planes
            contiguous along the channel axis).
        q_scale, k_scale: ``[D]`` per-head-dim RMSNorm gains.
        cos, sin: ``[B, N, D//2]`` fp32 RoPE tables (rotate-half pairing).
        patch_mask: optional ``[B, N]`` bool/int validity mask.
        num_heads: head count H (``D = C // H``).
        sliding_window: optional half-width |i-j| <= sw window.
        impl: ``"auto"`` (fused kernel on TPU when shapes allow, else the
            unfused composition), ``"fused"`` (force), or any
            ``dot_product_attention`` impl name for the unfused path.

    Returns:
        ``[B, N, C]`` attention output in qkv's dtype.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    if impl == "fused" or interpret:
        if interpret:
            return _fused_fwd(
                qkv, q_scale, k_scale, cos, sin, patch_mask,
                num_heads, sliding_window, interpret=True,
            )
        return _fused_op(
            qkv, q_scale, k_scale, cos, sin, patch_mask,
            num_heads, sliding_window,
        )
    if impl == "auto" and can_fuse(n, c, num_heads):
        return _fused_op(
            qkv, q_scale, k_scale, cos, sin, patch_mask,
            num_heads, sliding_window,
        )
    return unfused_qkv_attention(
        qkv, q_scale, k_scale, cos, sin, patch_mask,
        num_heads, sliding_window, attn_impl=impl,
    )


__all__ = [
    "fused_qkv_attention",
    "fused_qkv_attention_q8",
    "unfused_qkv_attention",
    "can_fuse",
    "can_fuse_bwd",
    "can_fuse_q8",
    "MAX_FUSED_TOKENS",
]
