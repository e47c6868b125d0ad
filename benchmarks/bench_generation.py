"""Generation-path TPU benchmark: DiT + UniPC sampling + ViTok decode.

VERDICT r4 #5: the generation path (ghost reference capability —
``/root/reference/tests/gpu/test_all.py:108-132`` documents the protocol
but ships no implementation) had never touched hardware. This times:

* the 20-step UniPC sampling loop at a DiT-L-ish config (w1024 d24 h16,
  ~460M params), batch >= 16, classifier-free guidance (batch doubling:
  every DiT forward runs 2B rows),
* both loop drivers: the host ``scheduler.step`` loop (a latents
  fetch + re-upload per step — on the remote tunnel that is ~2 RTT x
  steps of pure latency) and the TPU-native device loop
  (``unipc.sample_flow_unipc_device``: the whole sampler in ONE jitted
  program, zero host sync),
* optionally the ViTok decode of the sampled latents (the full
  generate.py pipeline).

Timing discipline per CLAUDE.md/bench.py: the device-loop arm computes a
scalar inside the jitted program and fetches it (the only reliable fence
here), varies the seed per iteration, and reports per-image ms + MFU
against the bf16 peak.

    python benchmarks/bench_generation.py --batch 16 --steps 20
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

V5E_BF16_PEAK = 197e12
V5E_INT8_PEAK = 394e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit-variant", default="L/256",
                    help="DiT variant (L = w1024 d24 h16, ~430M params)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--code-width", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfg-scale", type=float, default=4.0)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--host-loop-iters", type=int, default=2)
    ap.add_argument("--quant", action="store_true",
                    help="int8-quantize the DiT block linears "
                    "(DiT.quantize(); MFU then reads against the int8 peak)")
    ap.add_argument("--decode", action="store_true",
                    help="also time the ViTok decode of the latents")
    ap.add_argument("--ae-variant", default="Ld4-Ld24/1x16x64",
                    help="AE variant for --decode (code width must match "
                    "--code-width)")
    args = ap.parse_args()

    from vitok_tpu.models.dit import DiT, apply as dit_apply, decode_variant
    from vitok_tpu.unipc import (
        FlowUniPCMultistepScheduler,
        precompute_unipc_coefficients,
        sample_flow_unipc_device,
    )
    from generate import sample_latents

    b, n, cw, steps = args.batch, args.tokens, args.code_width, args.steps
    dit = DiT(
        **decode_variant(args.dit_variant), code_width=cw, text_dim=1000,
        param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
    )
    n_params = dit.num_params()
    if args.quant:
        dit.quantize()
    # FLOPs/image for one sampling run: steps DiT forwards at 2B rows (CFG
    # doubling) -> per image = steps * 2 * (2 * P * N).
    flops_per_img = steps * 2 * 2.0 * n_params * n
    print(f"# DiT {args.dit_variant}: {n_params/1e6:.1f}M params, "
          f"{flops_per_img/1e12:.2f} TFLOP/img for {steps}-step CFG sampling",
          file=sys.stderr)

    classes = list(range(b))
    side = int(math.isqrt(n))
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    row = jnp.tile(jnp.asarray(yy.ravel())[None], (2 * b, 1))
    col = jnp.tile(jnp.asarray(xx.ravel())[None], (2 * b, 1))
    ctx = jnp.concatenate([
        jnp.asarray(classes, jnp.int32),
        jnp.full((b,), dit.text_dim, jnp.int32),
    ])
    params, cfg = dit.params, dit.cfg

    # params flow as a jit ARGUMENT (closing over them would bake 430M
    # weights into the HLO as constants — the remote compile helper rejects
    # the oversized program with HTTP 413). Mirrors
    # generate.sample_latents_device's CFG wrapper but is kept local: the
    # benchmark must reuse ONE jitted program across iterations (the CLI
    # path re-jits per call) and pins bf16 compute for the MFU accounting.
    def v_fn(p, z, t):
        z_in = jnp.concatenate([z, z])
        t_in = jnp.full((2 * b,), 1.0, jnp.float32) * t
        v = dit_apply(
            p,
            {"z": z_in, "t": t_in, "context": ctx,
             "row_idx": row, "col_idx": col},
            cfg, compute_dtype=jnp.bfloat16,
        ).astype(jnp.float32)
        cond, uncond = v[:b], v[b:]
        return uncond + args.cfg_scale * (cond - uncond)

    coef = precompute_unipc_coefficients(
        FlowUniPCMultistepScheduler(shift=3.0), steps
    )

    @jax.jit
    def run_device(p, seed):
        z0 = jax.random.normal(
            jax.random.key(seed), (b, n, cw), jnp.float32
        )
        z = sample_flow_unipc_device(
            lambda z, t: v_fn(p, z, t), z0, coefficients=coef
        )
        return jnp.mean(z), z

    # --- device loop -----------------------------------------------------
    float(run_device(params, jnp.int32(0))[0])  # compile + warm
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        float(run_device(params, jnp.int32(i + 1))[0])
        times.append(time.perf_counter() - t0)
    dt_dev = float(np.mean(times))
    ms_img_dev = dt_dev / b * 1e3
    peak = V5E_INT8_PEAK if args.quant else V5E_BF16_PEAK
    mfu = flops_per_img * b / dt_dev / peak
    print(f"device-loop: {dt_dev*1e3:.1f} ms/batch ({ms_img_dev:.2f} ms/img, "
          f"{b/dt_dev:.2f} img/s, MFU {mfu:.3f}) over {args.iters} iters "
          f"(min {min(times)*1e3:.1f} ms)")

    # --- host loop (the shipped generate.py driver) ----------------------
    if args.host_loop_iters >= 1:
        sched = FlowUniPCMultistepScheduler(shift=3.0)
        sample_latents(dit, sched, classes, n, cw,
                       cfg_scale=args.cfg_scale, steps=steps, seed=0)  # warm
        times_h = []
        for i in range(args.host_loop_iters):
            t0 = time.perf_counter()
            z = sample_latents(
                dit, sched, classes, n, cw,
                cfg_scale=args.cfg_scale, steps=steps, seed=i + 1,
            )
            np.asarray(z)
            times_h.append(time.perf_counter() - t0)
        dt_host = float(np.mean(times_h))
        print(f"host-loop:   {dt_host*1e3:.1f} ms/batch "
              f"({dt_host/b*1e3:.2f} ms/img, {b/dt_host:.2f} img/s) — "
              f"device-loop speedup {dt_host/dt_dev:.2f}x")

    # --- optional: decode the latents with the 350M ViTok decoder --------
    if args.decode:
        from vitok_tpu.models import AEConfig, init_params
        from vitok_tpu.models.ae import decode_apply

        ae_cfg = AEConfig.from_variant(args.ae_variant)
        assert ae_cfg.channels_per_token == cw, (
            f"--ae-variant code width {ae_cfg.channels_per_token} != "
            f"--code-width {cw}"
        )
        ae_params = init_params(ae_cfg, jax.random.key(1), dtype=jnp.bfloat16)

        @jax.jit
        def dec(p, z):
            d = {
                "z": z,
                "patch_mask": jnp.ones((b, n), bool),
                "row_idx": jnp.tile(jnp.asarray(yy.ravel())[None], (b, 1)),
                "col_idx": jnp.tile(jnp.asarray(xx.ravel())[None], (b, 1)),
                "orig_height": jnp.full((b,), side * 16, jnp.int32),
                "orig_width": jnp.full((b,), side * 16, jnp.int32),
            }
            out = decode_apply(p, d, ae_cfg, compute_dtype=jnp.bfloat16)
            return jnp.mean(out["patches"].astype(jnp.float32))

        _, z_dev = run_device(params, jnp.int32(0))
        float(dec(ae_params, z_dev))  # compile
        t0 = time.perf_counter()
        float(dec(ae_params, z_dev))
        dt_dec = time.perf_counter() - t0
        print(f"vitok decode ({args.ae_variant}): {dt_dec*1e3:.1f} ms/batch "
              f"({dt_dec/b*1e3:.2f} ms/img)")


if __name__ == "__main__":
    main()
