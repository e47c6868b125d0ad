"""Interleaved A/B: batch-blocked megakernel grid (bb items per cell).

Hypothesis under test (round 4, after the input-side search closed): the
megakernel's standalone floor (~1.74 ms/call at the 5B decoder shape,
~230 GB/s effective, insensitive to payload bytes AND to DMA chunk
geometry — ab_q8_input.py arms A/C) is *per-cell issue/pipeline*
overhead. The shipped grid is strictly one batch item per cell
(``grid=(b, hg)``, block ``(1, n, cg)``). If a fixed per-cell cost
dominates, packing ``bb`` batch items into one cell (``grid=(b//bb,
hg)``, block ``(bb, n, cg)``) cuts total overhead ~bb× while keeping
total DMA bytes, total FLOPs, and the per-item math IDENTICAL (a static
in-kernel loop over the bb items).

Arms (all local to this benchmark — promoted to ``ops/fused_attention``
only on a real win):

* B  — the shipped ``fused_qkv_attention`` (bb=1, cg auto = 1536): the
       128-cell baseline.
* S2 — bb=2, cg=768: SAME cell count (32×4=128) and same bytes/cell as
       B, different block shape — a control isolating shape effects
       from cell-count effects.
* D2 — bb=2, cg=1536: HALF the cells (64), 2× bytes/cell. VMEM model
       ~13.2 MB — near the 16 MB scoped limit; may fail to compile.
* D4 — bb=4, cg=768: QUARTER the batch cells (16×4=64), same VMEM as D2.

Timing discipline per CLAUDE.md: all arms compiled up front, interleaved
in one process, ``layers`` calls chained in-jit with the loop-carried
dependency through the small RoPE table, scalar fetched per call.

Recorded invocations (the numbers quoted in BASELINE_NOTE.md round 4 and
``ops/fused_attention.py``'s group-size comments were produced with these
exact flags — the defaults are a quick smoke, not the recorded runs):

    # round-4 batch-block/grid sweep, 5B int8 decoder shape (bf16 qkv):
    python benchmarks/ab_batch_block.py --c 3072 --heads 24 --tokens 256 \
        --batch 64 --layers 256 --iters 6
    # small-N f32-family cg sweep (the _pick_group_channels n<=64 override):
    python benchmarks/ab_batch_block.py --c 3072 --heads 24 --tokens 64 \
        --batch 256 --dtype float32 --layers 256 --iters 6
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


class _Item:
    """Presents batch item ``i`` of a [bb, ...] ref with the [0, ...]
    indexing ``_attend_cell`` expects."""

    def __init__(self, ref, i):
        self.ref = ref
        self.i = i
        self.shape = (1,) + tuple(ref.shape[1:])
        self.dtype = ref.dtype

    def __getitem__(self, idx):
        if idx == 0:
            return self.ref[self.i]
        _, s1, s2 = idx
        return self.ref[self.i, s1, s2]


def _kernel_bb(
    qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
    o_ref,  # [bb, N, C_g]
    *,
    bb: int,
    heads_per_group: int,
    head_dim: int,
    sliding_window,
    use_mask: bool,
):
    for i in range(bb):
        def write(sl, val, _i=i):
            o_ref[_i, :, sl] = val

        fa._attend_cell(
            _Item(qmask_ref, i), _Item(cos_ref, i), _Item(sin_ref, i),
            qs_ref, ks_ref,
            _Item(q_ref, i), _Item(k_ref, i), _Item(v_ref, i),
            write,
            heads_per_group=heads_per_group,
            head_dim=head_dim,
            sliding_window=sliding_window,
            use_mask=use_mask,
            out_dtype=o_ref.dtype,
        )


def _kernel_pack(
    qmask_ref, cos_ref, sin_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
    o_ref,  # [bb, N, C_g]
    *,
    bb: int,
    heads_per_group: int,
    head_dim: int,
    use_mask: bool,
):
    """bb images packed along the TOKEN axis of one score tile.

    At n=64 the per-head score/PV matmuls are [64, d]x[d, 64] — half the
    MXU's 128 rows idle — and every [64, 64] VPU pass runs on 64 of 128
    lanes. Stacking bb images gives [bb*64, d] operands and one
    [bb*n, bb*n] score tile with cross-image blocks masked to -inf
    (exact: exp2 underflows to 0, PV adds exact zeros), so the per-image
    math is bit-identical to the unpacked kernel.
    """
    d = head_dim
    n = q_ref.shape[1]
    nn = bb * n
    qs = qs_ref[:, :].astype(jnp.float32)
    ks = ks_ref[:, :].astype(jnp.float32)
    cat = lambda ref: jnp.concatenate([ref[i] for i in range(bb)], axis=0)
    cos_b = cat(cos_ref)  # [nn, d2]
    sin_b = cat(sin_ref)
    q_all = cat(q_ref)    # [nn, cg]
    k_all = cat(k_ref)
    v_all = cat(v_ref)

    qi = jax.lax.broadcasted_iota(jnp.int32, (nn, nn), 0) // n
    ki = jax.lax.broadcasted_iota(jnp.int32, (nn, nn), 1) // n
    same_img = qi == ki
    if use_mask:
        kv = jnp.concatenate(
            [qmask_ref[i, 0, :] for i in range(bb)], axis=0
        )[None, :] > 0  # [1, nn]
        same_img = jnp.logical_and(same_img, kv)

    score_scale = jnp.float32(1.0 / (d ** 0.5) * 1.4426950408889634)
    for h in range(heads_per_group):
        sl = slice(h * d, (h + 1) * d)
        q = fa._norm_rope_half(q_all[:, sl], qs, cos_b, sin_b)
        k = fa._norm_rope_half(k_all[:, sl], ks, cos_b, sin_b)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * score_scale
        s = jnp.where(same_img, s, jnp.float32(fa._NEG_INF))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        for i in range(bb):
            o_ref[i, :, sl] = o[i * n:(i + 1) * n].astype(o_ref.dtype)


def fused_attention_bb(qkv, q_scale, k_scale, cos, sin, patch_mask, *,
                       num_heads, bb, cg, sliding_window=None,
                       pack=False, interpret=False):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert b % bb == 0 and c % cg == 0 and cg % d == 0
    hg = c // cg

    mask = patch_mask.astype(jnp.int32)
    if pack:
        assert sliding_window is None
        kernel = functools.partial(
            _kernel_pack,
            bb=bb,
            heads_per_group=cg // d,
            head_dim=d,
            use_mask=True,
        )
    else:
        kernel = functools.partial(
            _kernel_bb,
            bb=bb,
            heads_per_group=cg // d,
            head_dim=d,
            sliding_window=sliding_window,
            use_mask=True,
        )
    d2 = d // 2
    in_specs = [
        pl.BlockSpec((bb, 1, n), lambda bi, g: (bi, 0, 0)),    # mask
        pl.BlockSpec((bb, n, d2), lambda bi, g: (bi, 0, 0)),   # cos
        pl.BlockSpec((bb, n, d2), lambda bi, g: (bi, 0, 0)),   # sin
        pl.BlockSpec((1, d), lambda bi, g: (0, 0)),            # q scale
        pl.BlockSpec((1, d), lambda bi, g: (0, 0)),            # k scale
        pl.BlockSpec((bb, n, cg), lambda bi, g: (bi, 0, g)),
        pl.BlockSpec((bb, n, cg), lambda bi, g, _hg=hg: (bi, 0, _hg + g)),
        pl.BlockSpec((bb, n, cg), lambda bi, g, _hg=hg: (bi, 0, 2 * _hg + g)),
    ]
    out_spec = pl.BlockSpec((bb, n, cg), lambda bi, g: (bi, 0, g))
    return pl.pallas_call(
        kernel,
        grid=(b // bb, hg),
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--layers", type=int, default=8,
                    help="kernel calls chained per jit step")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="qkv dtype (float32 reproduces the small-N "
                    "f32-family sweep cited by ops/fused_attention.py)")
    args = ap.parse_args()

    c, h, n, b = args.c, args.heads, args.tokens, args.batch
    d = c // h
    qkv_dtype = jnp.dtype(args.dtype)
    key = jax.random.key(0)
    kq, ks_, kc = jax.random.split(key, 3)
    qkv = jax.random.normal(kq, (b, n, 3 * c), qkv_dtype)
    q_scale = jnp.ones((d,), jnp.float32) + 0.1 * jax.random.normal(ks_, (d,))
    k_scale = jnp.ones((d,), jnp.float32) + 0.1 * jax.random.normal(kc, (d,))
    pos = jnp.arange(n, dtype=jnp.float32)[None, :, None]
    freq = jnp.exp(-jnp.arange(d // 2, dtype=jnp.float32) / (d // 2))
    cos = jnp.cos(pos * freq)[0][None].repeat(b, 0)
    sin = jnp.sin(pos * freq)[0][None].repeat(b, 0)
    mask = jnp.ones((b, n), jnp.int32)
    layers = args.layers

    def make_run(bb, cg, pack=False):
        if bb == 1 and cg is None:
            def call(qkv_, cos_):
                return fa.fused_qkv_attention(
                    qkv_, q_scale, k_scale, cos_, sin, mask,
                    num_heads=h, impl="fused",
                )
        else:
            def call(qkv_, cos_):
                return fused_attention_bb(
                    qkv_, q_scale, k_scale, cos_, sin, mask,
                    num_heads=h, bb=bb, cg=cg, pack=pack,
                )

        @jax.jit
        def run(qkv_, cos_, tick):
            def body(i, carry):
                dep, acc = carry
                out = call(qkv_, cos_ + dep)
                probe = (out[0, 0, 0] + out[-1, -1, -1]).astype(jnp.float32)
                return probe * 0.0, acc + probe

            _, acc = jax.lax.fori_loop(0, layers, body, (tick, jnp.float32(0.0)))
            return acc

        return call, run

    # B follows the shipped auto pick (which depends on n — the n<=64
    # small-group override changes it), so its description reports the
    # resolved cg; G pins the large-group choice explicitly so the
    # large-vs-small comparison never silently measures the auto pick
    # against itself.
    auto_cg = fa._pick_group_channels(c, d, n)
    arm_defs = [
        ("B",  1, None, f"shipped bb=1 cg=auto({auto_cg}), "
                        f"{b * (c // max(auto_cg, 1))} cells"),
        ("G", 1, max((cg for cg in range(d, c, d)
                      if c % cg == 0 and cg % 128 == 0), default=None),
         "pinned large-group baseline"),
        ("S2", 2, 768,  "bb=2 cg=768: same 128 cells, control"),
        ("D2", 2, 1536, "bb=2 cg=1536: 64 cells, 2x bytes/cell"),
        ("D4", 4, 768,  "bb=4 cg=768: 64 cells, 2x bytes/cell"),
        ("C768", 1, 768,  "bb=1 cg=768: 2x cells, half bytes/cell"),
        ("C512", 1, 512,  "bb=1 cg=512"),
        ("C384", 1, 384,  "bb=1 cg=384: 4x cells"),
        ("C256", 1, 256,  "bb=1 cg=256"),
        ("C128", 1, 128,  "bb=1 cg=128: one head per cell"),
        ("P2", 2, 1536, "2 images packed per score tile (block-diag mask)"),
    ]

    arms = []
    ref_out = None
    for name, bb, cg, desc in arm_defs:
        if name != "B" and cg is None:
            print(f"arm {name} skipped: no lane-aligned group for c={c} d={d}")
            continue
        try:
            call, run = make_run(bb, cg, pack=name.startswith("P"))
            out = call(qkv, cos)
            out.block_until_ready()
            if ref_out is None:
                ref_out = out.astype(jnp.float32)
            else:
                dd = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref_out)))
                print(f"numeric {name}: max|{name}-B| = {dd:.6f} (expect 0.0)")
            float(run(qkv, cos, jnp.float32(0.0)))  # warm the chained program
            arms.append((name, run, desc))
        except Exception as e:  # compile failures (VMEM / tunnel 500)
            print(f"arm {name} FAILED to build: {type(e).__name__}: "
                  f"{str(e)[:200]}")

    times = {name: [] for name, _, _ in arms}
    t = 1.0
    for _ in range(args.iters):
        for name, run, _ in arms:
            t0 = time.perf_counter()
            float(run(qkv, cos, jnp.float32(t)))
            times[name].append((time.perf_counter() - t0) / layers)
            t += 1.0

    isz = qkv_dtype.itemsize
    byts = b * n * (3 * c * isz + c * isz)  # qkv in + attn out
    for name, _, desc in arms:
        dts = np.array(times[name])
        print(
            f"{name} ({desc}): {dts.mean() * 1e3:.3f} ms/call "
            f"(min {dts.min() * 1e3:.3f}, n={len(dts)}) "
            f"eff-BW {byts / dts.mean() / 1e9:.0f} GB/s"
        )
    if "B" in times and times["B"]:
        bmean = np.mean(times["B"])
        for name, _, _ in arms:
            if name == "B":
                continue
            r = np.mean(times[name]) / bmean
            print(f"delta {name}/B = {r:.4f} ({(r - 1) * 100:+.2f}%)")


if __name__ == "__main__":
    main()
