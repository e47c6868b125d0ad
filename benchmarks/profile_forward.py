"""Capture an xplane trace of the 5B forward and print per-op device time.

Usage (ambient TPU env):
    python benchmarks/profile_forward.py --variant Td4-T/1x16x64 --batch 64
    python benchmarks/profile_forward.py --dtype bf16

Aggregates XLA op durations from the TensorCore planes by op category so the
quant/attention/norm overhead vs GEMM time is directly visible.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import glob
import json
import tempfile

import numpy as np

import jax
import jax.numpy as jnp


def categorize(name: str) -> str:
    n = name.lower()
    if "fusion" in n or "convert" in n or "multiply" in n or "add" in n:
        cat = "elementwise/fusion"
    else:
        cat = "other"
    for pat, c in (
        ("dot", "gemm"),
        ("conv", "gemm"),
        ("reduce", "reduce"),
        ("copy", "copy"),
        ("transpose", "copy"),
        ("dynamic", "dynamic-slice"),
        ("scatter", "scatter"),
        ("gather", "gather"),
        ("custom-call", "custom-call"),
        ("all-reduce", "collective"),
    ):
        if pat in n:
            return c
    return cat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="Td4-T/1x16x64")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--train", action="store_true",
                    help="profile the full train step (AdamW, remat save-3)")
    ap.add_argument("--checkpoint", type=int, default=1)
    ap.add_argument("--remat-save", default="qkv_out,ffn_hid,attn_out")
    ap.add_argument("--sw", type=int, default=0,
                    help="sliding attention window (high-res profiling)")
    args = ap.parse_args()

    import dataclasses

    from bench import make_batch
    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.models.ae import forward_apply

    cfg = AEConfig.from_variant(args.variant, attn_impl="auto")
    if args.sw:
        cfg = dataclasses.replace(cfg, sw=args.sw)
    side = int(args.tokens ** 0.5)
    batch = make_batch(
        args.batch, args.tokens, (side, side), cfg.pixels_per_token
    )

    if args.train:
        from vitok_tpu.train_lib import (
            LossConfig, create_optimizer, create_schedule,
            create_train_state, make_train_step,
        )

        cfg = dataclasses.replace(
            cfg,
            checkpoint=args.checkpoint,
            remat_save=tuple(
                s for s in args.remat_save.split(",") if s
            ),
        )
        params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
        tx = create_optimizer(create_schedule("constant", 1e-4, 1000, 0.0))
        state = create_train_state(params, tx, ema=True)
        step = make_train_step(cfg, tx, LossConfig(), donate=False)
        rng = jax.random.key(1)

        @jax.jit
        def fwd(st, d, i):
            d2 = dict(d, patches=d["patches"] + (i * 0.0).astype(jnp.bfloat16))
            st, metrics = step(st, d2, rng)
            return st, metrics["loss/total"]

        state, l = fwd(state, batch, jnp.float32(0))
        float(l)
        state, l = fwd(state, batch, jnp.float32(1))
        float(l)

        tmp = tempfile.mkdtemp(prefix="xplane_")
        with jax.profiler.trace(tmp):
            for i in range(args.iters):
                state, l = fwd(state, batch, jnp.float32(2 + i))
                float(l)
        _report(tmp, args)
        return

    if args.dtype == "int8":
        from vitok_tpu.ops.quant import init_params_quantized

        params = init_params_quantized(cfg, jax.random.key(0))
    else:
        params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)

    @jax.jit
    def fwd(p, d, i):
        patches = d["patches"] + (i * 0.0).astype(jnp.bfloat16)
        out = forward_apply(
            p, dict(d, patches=patches), cfg, compute_dtype=jnp.bfloat16
        )
        return jnp.mean(out["patches"].astype(jnp.float32))

    # compile + warm
    float(fwd(params, batch, jnp.float32(0)))
    float(fwd(params, batch, jnp.float32(1)))

    tmp = tempfile.mkdtemp(prefix="xplane_")
    with jax.profiler.trace(tmp):
        for i in range(args.iters):
            float(fwd(params, batch, jnp.float32(2 + i)))
    _report(tmp, args)


def _report(tmp, args):
    files = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane produced under {tmp}"
    from jax.profiler import ProfileData

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for f in files:
        pd = ProfileData.from_file(f)
        for plane in pd.planes:
            if "TensorCore" not in plane.name and "/device" not in plane.name:
                continue
            for line in plane.lines:
                if "XLA Ops" not in line.name and "ops" not in line.name.lower():
                    continue
                for ev in line.events:
                    dur = ev.duration_ns / 1e6
                    name = ev.name
                    per_op[name] += dur
                    per_cat[categorize(name)] += dur
                    total += dur

    print(f"# total device op time: {total:.2f} ms over {args.iters} iters "
          f"({total / args.iters / args.batch:.3f} ms/img)")
    print("\n# by category (ms, % of device time):")
    for cat, ms in per_cat.most_common():
        print(f"  {cat:24s} {ms:10.2f}  {100 * ms / total:5.1f}%")
    print(f"\n# top {args.top} ops:")
    for name, ms in per_op.most_common(args.top):
        print(f"  {ms:10.2f}ms  {100 * ms / total:5.1f}%  {name[:110]}")
    print(json.dumps({"trace_dir": tmp, "total_ms": round(total, 2)}))


if __name__ == "__main__":
    main()
