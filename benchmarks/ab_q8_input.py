"""Interleaved A/B: int8 QKV INPUT to the attention megakernel vs bf16.

Hypothesis under test (round 4): the megakernel is DMA-bound in situ
(BASELINE_NOTE.md — DMA-only floor 1.54 ms/layer vs 1.57 measured at the
5B decoder shape), and its dominant traffic is the ``[B, N, 3C]`` bf16
QKV read. If the qkv GEMM handed it int8 codes + per-token scales
instead (the ``fused_ffn_int8`` requantize-epilogue pattern), the read
halves. Dequantization is nearly free where it matters:

* q/k enter a per-token RMSNorm, which cancels any per-token scale
  exactly (up to the 1e-6 eps against code-scale variances ~1e3) — the
  kernel can norm the RAW int8 codes, no dequant pass at all;
* v needs one ``[N, C_g]`` VPU multiply by the per-token scale — and the
  kernel's VPU is idle while its DMAs are the bottleneck.

Arm A: int8-input kernel variant (local to this benchmark — promoted to
``ops/fused_attention.py`` only if this measures a real win).
Arm B: the shipped bf16 ``fused_qkv_attention`` forward.

Both arms are compiled up front and timed interleaved in one process,
calls chained in-jit (loop-carried dependency through the small RoPE
table, NOT the big qkv array, so the dependency pass doesn't bias
either arm), scalar fetched per call — the tunnel timing discipline
from CLAUDE.md.

    python benchmarks/ab_q8_input.py --c 3072 --heads 24 --tokens 256 --batch 64
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from vitok_tpu.ops import fused_attention as fa


class _Plane:
    """Adapter presenting a dequantized [N, C_g] VMEM value to
    ``_attend_cell`` with the ref indexing it expects ([0, :, sl])."""

    def __init__(self, a):
        self.a = a
        self.shape = (1,) + a.shape
        self.dtype = a.dtype

    def __getitem__(self, idx):
        if idx == 0:
            return self.a
        _, s1, s2 = idx
        return self.a[s1, s2]


def _kernel_q8in(
    qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref, ts_ref,
    q_ref, k_ref, v_ref,  # [1, N, C_g] int8 planes of the qkv codes
    o_ref,  # [1, N, C_g] bf16
    *,
    heads_per_group: int,
    head_dim: int,
    sliding_window,
    use_mask: bool,
):
    ts = ts_ref[0].astype(jnp.float32)  # [N, 1] per-token code scale
    # q/k: raw codes — the RMSNorm inside _attend_cell cancels the
    # per-token scale (int8 codes are exact in bf16).
    qb = q_ref[0].astype(jnp.bfloat16)
    kb = k_ref[0].astype(jnp.bfloat16)
    # v: one full-width dequant multiply (VPU is idle under the DMA).
    vb = (v_ref[0].astype(jnp.float32) * ts).astype(jnp.bfloat16)

    def write(sl, val):
        o_ref[0, :, sl] = val

    fa._attend_cell(
        qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref,
        _Plane(qb), _Plane(kb), _Plane(vb),
        write,
        heads_per_group=heads_per_group,
        head_dim=head_dim,
        sliding_window=sliding_window,
        use_mask=use_mask,
        out_dtype=o_ref.dtype,
    )


def fused_attention_q8in(qkv8, tok_scale, q_scale, k_scale, cos, sin,
                         patch_mask, *, num_heads, sliding_window=None,
                         interpret=False):
    b, n, c3 = qkv8.shape
    c = c3 // 3
    d = c // num_heads
    cg = fa._pick_group_channels(c, d, n, lane_align=not interpret)
    if d == 64 and cg == d and c % (2 * d) == 0:
        cg = 2 * d
    hg = c // cg

    mask = patch_mask.astype(jnp.int32)
    kernel = functools.partial(
        _kernel_q8in,
        heads_per_group=cg // d,
        head_dim=d,
        sliding_window=sliding_window,
        use_mask=True,
    )
    d2 = d // 2
    in_specs = [
        pl.BlockSpec((1, 1, n), lambda bb, g: (bb, 0, 0)),    # mask
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # cos
        pl.BlockSpec((1, n, d2), lambda bb, g: (bb, 0, 0)),   # sin
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # q scale
        pl.BlockSpec((1, d), lambda bb, g: (0, 0)),           # k scale
        pl.BlockSpec((1, n, 1), lambda bb, g: (bb, 0, 0)),    # token scale
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
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        mask[:, None, :],
        cos.astype(jnp.bfloat16),
        sin.astype(jnp.bfloat16),
        q_scale.reshape(1, d),
        k_scale.reshape(1, d),
        tok_scale,
        qkv8, qkv8, qkv8,
    )


class _PlaneOff:
    """Lazy plane view into a full [1, N, 3C] qkv ref at a lane offset."""

    def __init__(self, ref, off, c):
        self.ref = ref
        self.off = off
        self.shape = (1, ref.shape[1], c)
        self.dtype = ref.dtype

    def __getitem__(self, idx):
        _, s1, sl = idx
        return self.ref[0, s1, self.off + sl.start:self.off + sl.stop]


def _kernel_contig(
    qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref,
    qkv_ref,  # [1, N, 3C] — ONE contiguous block per batch cell
    o_ref,    # [1, N, C]
    *,
    num_heads: int,
    head_dim: int,
    sliding_window,
    use_mask: bool,
):
    c = num_heads * head_dim

    def write(sl, val):
        o_ref[0, :, sl] = val

    fa._attend_cell(
        qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref,
        _PlaneOff(qkv_ref, 0, c),
        _PlaneOff(qkv_ref, c, c),
        _PlaneOff(qkv_ref, 2 * c, c),
        write,
        heads_per_group=num_heads,
        head_dim=head_dim,
        sliding_window=sliding_window,
        use_mask=use_mask,
        out_dtype=o_ref.dtype,
    )


def fused_attention_contig(qkv, q_scale, k_scale, cos, sin, patch_mask,
                           *, num_heads, sliding_window=None,
                           interpret=False):
    """Arm C: grid over batch only; the [1, N, 3C] input block is one
    CONTIGUOUS HBM region (vs 3 strided plane reads with row chunks of
    C_g*2 bytes) — tests whether the DMA floor is chunk/stride-bound."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads

    mask = patch_mask.astype(jnp.int32)
    kernel = functools.partial(
        _kernel_contig,
        num_heads=num_heads,
        head_dim=d,
        sliding_window=sliding_window,
        use_mask=True,
    )
    d2 = d // 2
    in_specs = [
        pl.BlockSpec((1, 1, n), lambda bb: (bb, 0, 0)),    # mask
        pl.BlockSpec((1, n, d2), lambda bb: (bb, 0, 0)),   # cos
        pl.BlockSpec((1, n, d2), lambda bb: (bb, 0, 0)),   # sin
        pl.BlockSpec((1, d), lambda bb: (0, 0)),           # q scale
        pl.BlockSpec((1, d), lambda bb: (0, 0)),           # k scale
        pl.BlockSpec((1, n, 3 * c), lambda bb: (bb, 0, 0)),
    ]
    out_spec = pl.BlockSpec((1, n, c), lambda bb: (bb, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        mask[:, None, :],
        cos.astype(qkv.dtype),
        sin.astype(qkv.dtype),
        q_scale.reshape(1, d),
        k_scale.reshape(1, d),
        qkv,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--layers", type=int, default=8,
                    help="kernel calls chained per jit step")
    args = ap.parse_args()

    c, h, n, b = args.c, args.heads, args.tokens, args.batch
    d = c // h
    key = jax.random.key(0)
    kq, ks_, kc = jax.random.split(key, 3)
    qkv = jax.random.normal(kq, (b, n, 3 * c), jnp.bfloat16)
    # Per-token symmetric int8 codes + scales (the qkv GEMM requantize
    # epilogue would produce exactly this).
    x32 = qkv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    tok_scale = jnp.maximum(amax / 127.0, 1e-12)
    qkv8 = jnp.clip(jnp.round(x32 / tok_scale), -127, 127).astype(jnp.int8)

    q_scale = jnp.ones((d,), jnp.float32) + 0.1 * jax.random.normal(ks_, (d,))
    k_scale = jnp.ones((d,), jnp.float32) + 0.1 * jax.random.normal(kc, (d,))
    pos = jnp.arange(n, dtype=jnp.float32)[None, :, None]
    freq = jnp.exp(-jnp.arange(d // 2, dtype=jnp.float32) / (d // 2))
    cos = jnp.cos(pos * freq)[0][None].repeat(b, 0)
    sin = jnp.sin(pos * freq)[0][None].repeat(b, 0)
    mask = jnp.ones((b, n), jnp.int32)

    layers = args.layers

    @jax.jit
    def run_a(qkv8_, ts_, cos_, tick):
        def body(i, carry):
            dep, acc = carry
            out = fused_attention_q8in(
                qkv8_, ts_, q_scale, k_scale, cos_ + dep, sin, mask,
                num_heads=h,
            )
            probe = (out[0, 0, 0] + out[-1, -1, -1]).astype(jnp.float32)
            return probe * 0.0, acc + probe

        _, acc = jax.lax.fori_loop(0, layers, body, (tick, jnp.float32(0.0)))
        return acc

    @jax.jit
    def run_b(qkv_, cos_, tick):
        def body(i, carry):
            dep, acc = carry
            out = fa.fused_qkv_attention(
                qkv_, q_scale, k_scale, cos_ + dep, sin, mask,
                num_heads=h, impl="fused",
            )
            probe = (out[0, 0, 0] + out[-1, -1, -1]).astype(jnp.float32)
            return probe * 0.0, acc + probe

        _, acc = jax.lax.fori_loop(0, layers, body, (tick, jnp.float32(0.0)))
        return acc

    @jax.jit
    def run_c(qkv_, cos_, tick):
        def body(i, carry):
            dep, acc = carry
            out = fused_attention_contig(
                qkv_, q_scale, k_scale, cos_ + dep, sin, mask, num_heads=h,
            )
            probe = (out[0, 0, 0] + out[-1, -1, -1]).astype(jnp.float32)
            return probe * 0.0, acc + probe

        _, acc = jax.lax.fori_loop(0, layers, body, (tick, jnp.float32(0.0)))
        return acc

    # numeric leg: output diff is dominated by the input quantization step
    oa = fused_attention_q8in(qkv8, tok_scale, q_scale, k_scale, cos, sin,
                              mask, num_heads=h)
    ob = fa.fused_qkv_attention(qkv, q_scale, k_scale, cos, sin, mask,
                                num_heads=h, impl="fused")
    da = float(jnp.max(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32))))
    mb = float(jnp.max(jnp.abs(ob.astype(jnp.float32))))
    print(f"numeric A: max|A-B|={da:.5f} max|B|={mb:.3f} rel={da / mb:.5f}")
    oc = fused_attention_contig(qkv, q_scale, k_scale, cos, sin, mask,
                                num_heads=h)
    dc = float(jnp.max(jnp.abs(oc.astype(jnp.float32) - ob.astype(jnp.float32))))
    print(f"numeric C: max|C-B|={dc:.6f} (same math, expect ~bf16 exact)")

    # warm + compile all arms
    float(run_a(qkv8, tok_scale, cos, jnp.float32(0.0)))
    float(run_b(qkv, cos, jnp.float32(0.0)))
    float(run_c(qkv, cos, jnp.float32(0.0)))

    arms = (("A", lambda tt: run_a(qkv8, tok_scale, cos, tt)),
            ("B", lambda tt: run_b(qkv, cos, tt)),
            ("C", lambda tt: run_c(qkv, cos, tt)))
    times = {name: [] for name, _ in arms}
    t = 1.0
    for _ in range(args.iters):
        for name, fn in arms:
            t0 = time.perf_counter()
            float(fn(jnp.float32(t)))
            times[name].append((time.perf_counter() - t0) / layers)
            t += 1.0

    bytes_a = b * n * (3 * c * 1 + c * 2)  # int8 in, bf16 out
    bytes_b = b * n * (3 * c * 2 + c * 2)
    labels = {"A": "int8-in strided", "B": "bf16-in strided",
              "C": "bf16-in contiguous"}
    for name, byts in (("A", bytes_a), ("B", bytes_b), ("C", bytes_b)):
        dts = np.array(times[name])
        print(
            f"{name} ({labels[name]}): {dts.mean() * 1e3:.3f} ms/call "
            f"(min {dts.min() * 1e3:.3f}, n={len(dts)}) "
            f"eff-BW {byts / dts.mean() / 1e9:.0f} GB/s"
        )
    bmean = np.mean(times["B"])
    for name in ("A", "C"):
        r = np.mean(times[name]) / bmean
        print(f"delta {name}/B = {r:.4f} ({(r - 1) * 100:+.2f}%)")


if __name__ == "__main__":
    main()
