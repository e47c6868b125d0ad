"""Microbench: fused FFN kernel vs the unfused int8 fc1->silu->quant chain.

Usage (ambient TPU env; run with the host otherwise quiet):
    python benchmarks/bench_fused_ffn.py                  # 5B decoder shape
    python benchmarks/bench_fused_ffn.py --c 1024 --f 2736  # 350M shape
    python benchmarks/bench_fused_ffn.py --check-only     # numerics only

Timing discipline per CLAUDE.md: scalar computed in-program, inputs varied
per iteration, chained in-jit to amortize the tunnel RTT.
"""

from __future__ import annotations

import argparse
import functools
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64 * 256)
    ap.add_argument("--c", type=int, default=3072)
    ap.add_argument("--f", type=int, default=8208)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    from vitok_tpu.ops.quant import (
        fused_ffn_int8,
        fused_silu_quant,
        int8_matmul_prequant,
        pad_fc1_kernel,
        quantize_activation,
        quantize_weight,
    )

    rng = np.random.default_rng(0)
    m, c, f = args.m, args.c, args.f
    x = jnp.asarray(rng.standard_normal((m, c)) * 0.5, jnp.bfloat16)
    hq, hs = quantize_activation(x)
    hq, hs = jax.device_put(hq), jax.device_put(hs)
    w = jnp.asarray(rng.standard_normal((c, 2 * f)) * 0.02, jnp.bfloat16)
    fc1 = quantize_weight(pad_fc1_kernel(w))
    fc1 = jax.device_put(fc1)
    fp = fc1["kernel_int8"].shape[-1] // 2

    # --- numerics: fused vs unfused on device ---
    @jax.jit
    def unfused(hq, hs):
        hid = int8_matmul_prequant(hq[None], hs[None], fc1, jnp.bfloat16)
        q, s = fused_silu_quant(hid)
        return q[0], s[0]

    @jax.jit
    def fused(hq, hs):
        return fused_ffn_int8(hq, hs, fc1)

    qa, sa = jax.device_get(unfused(hq, hs))
    qb, sb = jax.device_get(fused(hq, hs))
    diff = np.abs(qa.astype(np.int32) - qb.astype(np.int32))
    srel = np.abs(sa - sb) / np.maximum(np.abs(sa), 1e-12)
    print(f"# int8 diff: max {diff.max()}  frac>1 {(diff > 1).mean():.2e}")
    print(f"# scale rel: max {srel.max():.3e}")
    assert diff.max() <= 2 and (diff > 1).mean() < 0.01, "numerics mismatch"
    assert srel.max() < 2e-2, "scale mismatch"
    if args.check_only:
        print("# numerics OK")
        return

    # --- timing: chain in-jit, vary input per step via the carry ---
    def chained(step_fn):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(hq, hs, chain):
            def body(i, carry):
                q, s = carry
                # Chain a (zero-valued) data dependency on the previous
                # iteration's outputs so steps can't be elided or cached.
                nq = (hq + q[:, :1] * 0).astype(jnp.int8)
                qq, ss = step_fn(nq, hs + s[:, :1] * 0.0)
                return (qq, ss)

            q, s = jax.lax.fori_loop(
                0, chain, body, (jnp.zeros((m, fp), jnp.int8), hs * 1.0)
            )
            return jnp.sum(q.astype(jnp.float32)), jnp.mean(s)

        return run

    flops = 2.0 * m * c * 2 * fp

    for name, fn in (("unfused", unfused), ("fused", fused)):
        run = chained(fn)
        # Warm with the SAME static chain count — a different value here
        # would recompile inside the timed loop (tunnel compiles ~20s).
        float(run(hq, hs, args.chain)[0])
        t0 = time.perf_counter()
        for i in range(args.iters):
            float(run(hq, hs, args.chain)[0])
        dt = (time.perf_counter() - t0) / (args.iters * args.chain)
        print(
            f"{name:8s} {dt * 1e3:8.3f} ms  "
            f"{flops / dt / 1e12:6.1f} TFLOP/s (int8 peak 394)"
        )


if __name__ == "__main__":
    main()
