"""DiT flow-matching train-step device rate (chained, fenced).

The train_dit.py CLI wall rate on the remote tunnel is host/transfer
bound (per-step latent upload + RTT + on-the-fly AE encode); this
isolates the DEVICE cost of the jitted train step — same loss/optimizer
machinery as the CLI — by chaining steps in-jit with a loop-carried
dependency (CLAUDE.md timing discipline) and fetching one scalar.

    python benchmarks/bench_dit_train.py --dit L/256 --bs 32 --checkpoint 1
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit", default="L/256")
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--code-width", type=int, default=64)
    ap.add_argument("--checkpoint", type=int, default=1)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from vitok_tpu.models.dit import (
        DiTConfig,
        apply as dit_apply,
        decode_variant,
        init_params,
    )
    from vitok_tpu.train_lib import create_optimizer, create_schedule

    cfg = DiTConfig(
        **decode_variant(args.dit), code_width=args.code_width,
        text_dim=1000, checkpoint=args.checkpoint,
    )
    b, n = args.bs, args.tokens
    params = init_params(cfg, jax.random.key(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = create_optimizer(create_schedule("constant", 1e-3, 100, 0.0))
    opt = tx.init(params)

    def loss_fn(p, z, labels, rng):
        t_rng, e_rng, d_rng = jax.random.split(rng, 3)
        sigma = jax.random.uniform(t_rng, (b,))
        eps = jax.random.normal(e_rng, z.shape, z.dtype)
        x_sigma = (1 - sigma[:, None, None]) * z + sigma[:, None, None] * eps
        ctx = jnp.where(
            jax.random.bernoulli(d_rng, 0.1, (b,)), cfg.text_dim, labels
        )
        v = dit_apply(
            p, {"z": x_sigma, "t": sigma * 1000.0, "context": ctx}, cfg,
            compute_dtype=jnp.bfloat16, deterministic=False,
        )
        tgt = eps - z
        return jnp.mean((v.astype(jnp.float32) - tgt.astype(jnp.float32)) ** 2)

    # Donated single step (an in-jit chained loop would carry a second
    # params+optimizer copy — OOM at DiT-L f32 state on 16GB). Each timed
    # call pays one ~28ms tunnel RTT; reported alongside, not hidden.
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, opt, z, labels, seed):
        loss, grads = jax.value_and_grad(loss_fn)(
            p, z, labels, jax.random.fold_in(jax.random.key(0), seed)
        )
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    z = jax.random.normal(jax.random.key(1), (b, n, args.code_width))
    labels = jnp.zeros((b,), jnp.int32)
    params, opt, l = step(params, opt, z, labels, jnp.int32(0))
    float(l)  # compile + warm
    times = []
    for i in range(args.iters * args.chain):
        t0 = time.perf_counter()
        params, opt, l = step(params, opt, z, labels, jnp.int32(i + 1))
        float(l)
        times.append(time.perf_counter() - t0)
    dt = float(np.mean(times))
    mfu = 6.0 * n_params * n * b / dt / V5E_BF16_PEAK
    print(f"DiT {args.dit} ({n_params/1e6:.1f}M) train bs{b} "
          f"checkpoint={args.checkpoint}: {dt*1e3:.1f} ms/step incl. ~28ms "
          f"tunnel RTT ({b/dt:.1f} img/s, model-MFU >= {mfu:.3f}) "
          f"[{args.iters * args.chain} fenced steps]")


if __name__ == "__main__":
    main()
