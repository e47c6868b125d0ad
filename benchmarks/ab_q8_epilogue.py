"""Interleaved A/B: in-kernel int8 quantize epilogue vs XLA quantize chain.

Arm A routes inference attention through ``fused_qkv_attention_q8`` (the
megakernel quantizes its own output per token; the out projection consumes
int8+scales directly). Arm B is the round-3 routing: megakernel bf16 output
+ the XLA ``quantize_activation`` chain. Both arms are compiled up front
(the toggle is the trace-time ``fused_attention._ENABLE_Q8`` flag) and
timed interleaved in one process — the only methodology that resolves
sub-5% deltas through the tunnel's run-to-run variance (CLAUDE.md).

Also emits a device-side numeric leg: max|A-B| / max|B| over the decoded
patches from a single jitted program that traces both routings.

    python benchmarks/ab_q8_epilogue.py --variant 5B --tokens 256 --batch 64
"""

from __future__ import annotations

import argparse
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
    "tiny128": "w512_d2_h4-w512_d4_h4/1x16x16",  # d=128 heads
}


def build(variant: str, n_tokens: int, batch: int):
    from bench import make_batch
    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.ops.quant import quantize_block_params_device

    cfg = AEConfig.from_variant(VARIANT_ALIASES.get(variant, variant))
    params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    params = quantize_block_params_device(params)
    side = int(np.sqrt(n_tokens))
    data = make_batch(batch, n_tokens, (side, side), cfg.pixels_per_token)
    return cfg, params, data, n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="tiny")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from vitok_tpu.models.ae import forward_apply
    from vitok_tpu.ops import fused_attention as fa

    cfg, params, data, n_params = build(args.variant, args.tokens, args.batch)

    def fwd_chain(p, d, i, chain):
        patches = d["patches"] + (i * 0.0).astype(jnp.bfloat16)

        def body(_, pt):
            out = forward_apply(p, dict(d, patches=pt), cfg,
                                compute_dtype=jnp.bfloat16)
            return out["patches"]

        final = jax.lax.fori_loop(0, chain, body, patches)
        return jnp.mean(final.astype(jnp.float32))

    import functools

    jA = jax.jit(functools.partial(fwd_chain), static_argnums=(3,))
    jB = jax.jit(functools.partial(fwd_chain), static_argnums=(3,))

    def compile_arm(jf, disable_q8: bool, chain: int):
        prev = fa._ENABLE_Q8
        fa._ENABLE_Q8 = not disable_q8
        try:
            return float(jf(params, data, jnp.float32(0.0), chain))
        finally:
            fa._ENABLE_Q8 = prev

    # --- numeric leg: both routings inside ONE jitted program ---
    @jax.jit
    def diff(p, d):
        prev = fa._ENABLE_Q8
        fa._ENABLE_Q8 = True
        a = forward_apply(p, d, cfg, compute_dtype=jnp.bfloat16)["patches"]
        fa._ENABLE_Q8 = False
        b = forward_apply(p, d, cfg, compute_dtype=jnp.bfloat16)["patches"]
        fa._ENABLE_Q8 = prev
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        return (jnp.max(jnp.abs(a32 - b32)),
                jnp.max(jnp.abs(b32)))

    dmax, bmax = map(float, diff(params, data))
    rel = dmax / max(bmax, 1e-9)
    print(f"numeric: max|A-B|={dmax:.5f} max|B|={bmax:.3f} rel={rel:.5f}")

    # --- timing leg ---
    compile_arm(jA, False, 1)
    compile_arm(jB, True, 1)
    t0 = time.perf_counter()
    compile_arm(jA, False, 1)
    t_single = time.perf_counter() - t0
    chain = int(min(max(round(1.5 / max(t_single, 1e-3)), 2), 32))
    compile_arm(jA, False, chain)
    compile_arm(jB, True, chain)

    times = {"A": [], "B": []}
    c = 1.0
    for _ in range(args.iters):
        for name, jf, dis in (("A", jA, False), ("B", jB, True)):
            t0 = time.perf_counter()
            compile_arm_val = None
            prev = fa._ENABLE_Q8  # compiled: flag irrelevant now, kept tidy
            fa._ENABLE_Q8 = not dis
            try:
                compile_arm_val = float(jf(params, data, jnp.float32(c), chain))
            finally:
                fa._ENABLE_Q8 = prev
            dt = (time.perf_counter() - t0) / chain
            times[name].append(dt)
            c += 1.0
            del compile_arm_val

    for name, lab in (("A", "q8-epilogue"), ("B", "xla-quant")):
        dts = np.array(times[name])
        ms_img = dts / args.batch * 1e3
        flops = 2.0 * n_params * args.tokens * args.batch
        tflops = flops / dts.mean() / 1e12
        print(
            f"{name} ({lab}): {ms_img.mean():.3f} ms/img "
            f"(min {ms_img.min():.3f}, n={len(dts)}, chain={chain}) "
            f"eff {tflops:.1f} TFLOP/s"
        )
    a, b = np.mean(times["A"]), np.mean(times["B"])
    print(f"delta: A/B = {a / b:.4f} ({(a / b - 1) * 100:+.2f}%)")


if __name__ == "__main__":
    main()
