"""MFU benchmark across variants and token counts.

The reference README advertises a ``benchmarks/benchmark_mfu.py`` that was
never shipped (SURVEY.md §2.11 — its MFU math lives inline in the trainer).
This is a real one: forward (and optional train-step) MFU for a variant
sweep, using analytic model FLOPs (2/6 x params x tokens; XLA cost
analysis undercounts lax.scan bodies depth-fold) and scalar-fetch fencing.

    python benchmarks/benchmark_mfu.py --variants 350M,5B --tokens 256,1024
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

VARIANT_ALIASES = {
    "350M": "Ld4-Ld24/1x16x64",
    "5B": "Td4-T/1x16x64",
    "tiny": "w256_d2_h4-w256_d4_h4/1x16x16",
}


def run_one(variant: str, n_tokens: int, batch: int, iters: int,
            sw: int = 0, dtype: str = "bf16"):
    import dataclasses

    from bench import make_batch
    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.models.ae import forward_apply
    from vitok_tpu.utils.profiling import PEAK_FLOPS

    cfg = AEConfig.from_variant(VARIANT_ALIASES.get(variant, variant))
    if sw:
        cfg = dataclasses.replace(cfg, sw=sw)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if dtype == "int8":
        # Device-native quantization: the host path round-trips multi-GB
        # params through the tunnel (minutes-slow at 5B scale).
        from vitok_tpu.ops.quant import quantize_block_params_device

        params = quantize_block_params_device(params)
    side = int(np.sqrt(n_tokens))
    data = make_batch(batch, n_tokens, (side, side), cfg.pixels_per_token)

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def jfwd(p, d, i, chain):
        # Chain `chain` forwards in-jit (each feeding the next) so the
        # ~29ms tunnel RTT amortizes — same discipline as bench.measure.
        patches = d["patches"] + (i * 0.0).astype(jnp.bfloat16)

        def body(_, pt):
            out = forward_apply(p, dict(d, patches=pt), cfg,
                                compute_dtype=jnp.bfloat16)
            return out["patches"]

        final = jax.lax.fori_loop(0, chain, body, patches)
        return jnp.mean(final.astype(jnp.float32))

    c = 0
    float(jfwd(params, data, jnp.float32(c), 1))
    c += 1
    t0 = time.perf_counter()
    float(jfwd(params, data, jnp.float32(c), 1))
    c += 1
    t_single = time.perf_counter() - t0
    chain = int(min(max(round(1.5 / max(t_single, 1e-3)), 2), 32))
    float(jfwd(params, data, jnp.float32(c), chain))
    c += 1
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jfwd(params, data, jnp.float32(c), chain))
        c += 1
    dt = (time.perf_counter() - t0) / (iters * chain)
    # Analytic forward FLOPs (2 * params * tokens per image): XLA cost
    # analysis counts a lax.scan body once, not x depth, so it undercounts
    # scanned models ~depth-fold.
    model_flops = 2.0 * n_params * n_tokens * batch
    eff_flops = model_flops / dt
    return {
        "variant": variant,
        "tokens": n_tokens,
        "batch": batch,
        "sw": sw or None,
        "dtype": dtype,
        "ms_per_img": dt / batch * 1e3,
        "img_per_s": batch / dt,
        "model_flops_per_call": model_flops,
        "effective_tflops": eff_flops / 1e12,
        "mfu_vs_v5e_bf16": eff_flops / PEAK_FLOPS["v5e"],
        "n_params": n_params,
    }


def run_train(variant: str, n_tokens: int, batch: int, iters: int,
              checkpoint: int, moment_dtype, optimizer: str = "adamw",
              remat_save: tuple = (), attn_impl: str = "auto"):
    """Full train-step MFU: loss + grads + AdamW/Muon update, chained
    in-jit (lax.scan over steps) so tunnel RTT doesn't pollute timing."""
    import dataclasses

    from bench import make_batch
    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.train_lib import (
        LossConfig,
        create_optimizer,
        create_schedule,
        create_train_state,
        make_train_step,
    )
    from vitok_tpu.utils.profiling import PEAK_FLOPS

    cfg = AEConfig.from_variant(VARIANT_ALIASES.get(variant, variant))
    cfg = dataclasses.replace(
        cfg, checkpoint=checkpoint, remat_save=tuple(remat_save),
        attn_impl=attn_impl,
    )
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = create_optimizer(
        create_schedule("constant", 1e-4, 1000, 0.0),
        optimizer=optimizer, moment_dtype=moment_dtype,
    )
    state = create_train_state(params, tx, ema=True)
    side = int(np.sqrt(n_tokens))
    data = make_batch(batch, n_tokens, (side, side), cfg.pixels_per_token)
    step = make_train_step(cfg, tx, LossConfig(), donate=False)
    rng = jax.random.key(1)

    def chained(state_, d, n):
        def body(carry, i):
            st = carry
            d2 = dict(d, patches=d["patches"] + (i * 0.0).astype(jnp.bfloat16))
            st, metrics = step(st, d2, rng)  # jit-in-jit inlines
            return st, metrics["loss/total"]
        return jax.lax.scan(body, state_, jnp.arange(n))

    # Donation-neutral chaining: the state is donated in AND returned, so
    # exactly one copy ever lives on device (a scalar-only return would
    # force a warmup copy of the whole state and double HBM).
    many = jax.jit(
        lambda s, d: chained(s, d, iters), donate_argnums=(0,)
    )
    state, losses = many(state, data)  # compile + warmup
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = many(state, data)
    float(losses[-1])  # scalar fetch = completion fence
    dt = (time.perf_counter() - t0) / iters
    # Analytic model FLOPs (XLA cost analysis counts a lax.scan body ONCE,
    # not x depth, so it undercounts scanned models ~25x). Standard
    # convention: 6 * params * tokens (fwd 2 + bwd 4) per image; remat
    # recompute is intentionally NOT counted (model MFU, not hardware).
    model_flops = 6.0 * n_params * n_tokens * batch
    eff = model_flops / dt
    return {
        "variant": variant, "mode": "train", "tokens": n_tokens,
        "batch": batch, "checkpoint": checkpoint,
        "remat_save": ",".join(remat_save),
        "optimizer": optimizer,
        "moment_dtype": str(moment_dtype.__name__) if moment_dtype else "f32",
        "ms_per_step": dt * 1e3,
        "img_per_s": batch / dt,
        "model_flops_per_step": model_flops,
        "effective_tflops": eff / 1e12,
        "mfu_vs_v5e_bf16": eff / PEAK_FLOPS["v5e"],
        "n_params": n_params,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="tiny")
    ap.add_argument("--tokens", default="256")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--train", action="store_true",
                    help="benchmark the full train step instead of forward")
    ap.add_argument("--checkpoint", type=int, default=0,
                    help="remat granularity for --train (0 = no remat)")
    ap.add_argument("--optimizer", default="adamw")
    ap.add_argument("--moment-dtype", default=None, choices=[None, "bf16"])
    ap.add_argument("--remat-save", default="",
                    help="comma list of remat-saved intermediates for "
                    "--train --checkpoint 1 (qkv_out,ffn_hid,attn_out)")
    ap.add_argument("--attn-impl", default="auto",
                    help="attention impl for --train (auto/xla/fused)")
    ap.add_argument("--sw", type=int, default=0,
                    help="sliding attention window (forward mode only)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"],
                    help="block weight dtype (forward mode only)")
    args = ap.parse_args()
    remat_save = tuple(
        s.strip() for s in args.remat_save.split(",") if s.strip()
    )
    for v in args.variants.split(","):
        for t in args.tokens.split(","):
            if args.train:
                r = run_train(
                    v.strip(), int(t), args.batch, args.iters,
                    args.checkpoint,
                    jnp.bfloat16 if args.moment_dtype == "bf16" else None,
                    args.optimizer,
                    remat_save,
                    args.attn_impl,
                )
            else:
                r = run_one(v.strip(), int(t), args.batch, args.iters,
                            sw=args.sw, dtype=args.dtype)
            print(json.dumps({k: (round(x, 4) if isinstance(x, float) else x)
                              for k, x in r.items()}), flush=True)


if __name__ == "__main__":
    main()
