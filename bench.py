"""Benchmark: 5B-f16x64 encode+decode throughput @256p on one chip.

The north-star config from BASELINE.json: ViTok-v2 5B (Td4-T/1x16x64),
bf16, 256 tokens/image. Reference anchor: 3.59 ms/img on A100-80GB batch 500
with torch.compile (docs/index.html:498-509) => ~278.6 img/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_REF_IMG_PER_S = 1000.0 / 3.59  # ≈278.6 img/s (reference anchor)
# Peak of the dtype actually running — MFU must be computed against this
# (reporting int8 throughput against the bf16 peak overstates utilization
# 2x). See BASELINE_NOTE.md for the anchor-physics derivation.
V5E_PEAK_TFLOPS = {"bf16": 197.0, "int8": 394.0}


def make_batch(b: int, n: int, grid, pixels_per_token: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    gr, gc = grid
    yy, xx = np.meshgrid(np.arange(gr), np.arange(gc), indexing="ij")
    tile = lambda a: np.tile(a.ravel()[None], (b, 1)).astype(np.int32)
    return {
        "patches": jnp.asarray(
            rng.standard_normal((b, n, pixels_per_token)).astype(np.float32),
            dtype=jnp.bfloat16,
        ),
        "patch_mask": jnp.ones((b, n), bool),
        "row_idx": jnp.asarray(tile(yy)),
        "col_idx": jnp.asarray(tile(xx)),
        "orig_height": jnp.full((b,), gr * 16, jnp.int32),
        "orig_width": jnp.full((b,), gc * 16, jnp.int32),
    }


def bench_variant(variant: str, batch_sizes, n_tokens=256, grid=(16, 16),
                  iters=20, warmup=3, attn_impl="auto", quant=False):
    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.models.ae import forward_apply

    cfg = AEConfig.from_variant(variant, attn_impl=attn_impl)
    if quant:
        # Same methodology as the reference baseline, whose A100 numbers run
        # torchao FP8-quantized (eval_vae.py:85); int8 is the v5e analog.
        # Throughput-only: build int8 weights natively (the real checkpoint
        # path goes through quantize_block_params).
        from vitok_tpu.ops.quant import init_params_quantized

        params = init_params_quantized(cfg, jax.random.key(0))
    else:
        params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    # Weight count for the MFU estimate (exclude int8 bookkeeping scales).
    n_params = sum(
        leaf.size
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if getattr(path[-1], "key", "") != "scale"
        or "norm" in str(path)
    )

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd(p, d, i, chain):
        # Fold a per-iteration counter into the input (unique executions) and
        # reduce the output to one scalar INSIDE the program: fetching that
        # scalar is the only reliable completion fence on the remote-tunnel
        # runtime (block_until_ready has been observed to return early).
        # `chain` sequential forwards amortize the ~35ms tunnel RTT for small
        # models; the output patches feed the next forward (data dependency
        # prevents any elision).
        patches = d["patches"] + (i * 0.0).astype(jnp.bfloat16)

        def body(_, pt):
            out = forward_apply(
                p, dict(d, patches=pt), cfg, compute_dtype=jnp.bfloat16
            )
            return out["patches"]

        final = jax.lax.fori_loop(0, chain, body, patches)
        return jnp.mean(final.astype(jnp.float32))

    best = {"img_per_s": 0.0, "batch": 0, "ms_per_img": float("inf")}
    for b in batch_sizes:
        batch = make_batch(b, n_tokens, grid, cfg.pixels_per_token)
        counter = 0
        try:
            float(fwd(params, batch, jnp.float32(counter), 1))
            counter += 1
            t0 = time.perf_counter()
            float(fwd(params, batch, jnp.float32(counter), 1))
            counter += 1
            t_single = time.perf_counter() - t0
            # Pick chain so one dispatch runs >= ~0.5s of device work.
            chain = int(min(max(round(0.5 / max(t_single, 1e-3)), 1), 32))
            for _ in range(max(warmup - 1, 1)):
                float(fwd(params, batch, jnp.float32(counter), chain))
                counter += 1
            t0 = time.perf_counter()
            vals = []
            for _ in range(iters):
                vals.append(
                    float(fwd(params, batch, jnp.float32(counter), chain))
                )
                counter += 1
            dt = (time.perf_counter() - t0) / (iters * chain)
            assert all(np.isfinite(v) for v in vals), "non-finite outputs"
        except Exception as e:  # OOM at large batch — keep best so far
            print(f"# batch {b} failed: {type(e).__name__}", file=sys.stderr)
            break
        img_per_s = b / dt
        if img_per_s > best["img_per_s"]:
            best = {
                "img_per_s": img_per_s,
                "batch": b,
                "ms_per_img": dt / b * 1e3,
            }
        print(
            f"# {variant} b={b}: {img_per_s:.1f} img/s ({dt/b*1e3:.3f} ms/img)",
            file=sys.stderr,
        )
    # Forward-pass FLOPs ≈ 2 * params * tokens (matmul-dominated).
    flops_per_img = 2.0 * n_params * n_tokens
    peak = V5E_PEAK_TFLOPS["int8" if quant else "bf16"]
    best["mfu"] = best["img_per_s"] * flops_per_img / (peak * 1e12)
    best["n_params"] = n_params
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small-model smoke")
    ap.add_argument("--variant", default="Td4-T/1x16x64")
    ap.add_argument("--batches", default=None, help="comma-separated batch sizes")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="int8", choices=["bf16", "int8"],
                    help="int8 matches the reference's quantized-eval methodology")
    ap.add_argument("--both", action="store_true",
                    help="also measure the other dtype at the best batch")
    args = ap.parse_args()

    if args.quick:
        variant = "w256_d2_h4-w256_d4_h4/1x16x16"
        batches = [8]
        iters = 5
    else:
        variant = args.variant
        batches = (
            [int(x) for x in args.batches.split(",")]
            if args.batches
            else [32, 64]  # 64 is the measured throughput optimum on v5e
        )
        iters = args.iters

    best = bench_variant(
        variant, batches, iters=iters, quant=(args.dtype == "int8")
    )
    result = {
        "metric": f"{variant} encode+decode img/s/chip @256p {args.dtype}",
        "value": round(best["img_per_s"], 2),
        "unit": "img/s",
        "vs_baseline": round(best["img_per_s"] / A100_REF_IMG_PER_S, 3),
        "ms_per_img": round(best["ms_per_img"], 3),
        "batch": best["batch"],
        "mfu": round(best["mfu"], 3),
        "mfu_peak_tflops": V5E_PEAK_TFLOPS[args.dtype],
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
        # Full fenced encode+decode on one v5e chip. The published anchor
        # (3.59 ms/img) exceeds A100 physics for that workload — derivation
        # with arithmetic in BASELINE_NOTE.md.
        "baseline_note": "anchor exceeds A100 peak FLOPs; see BASELINE_NOTE.md",
    }
    if args.both:
        alt = bench_variant(
            variant, [best["batch"]], iters=iters,
            quant=(args.dtype != "int8"),
        )
        other = "int8" if args.dtype == "bf16" else "bf16"
        result[f"{other}_img_per_s"] = round(alt["img_per_s"], 2)
        result[f"{other}_ms_per_img"] = round(alt["ms_per_img"], 3)
        result[f"{other}_mfu"] = round(alt["mfu"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
