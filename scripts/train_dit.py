"""DiT flow-matching training over ViTok latents.

The training recipe the reference documents but never shipped
(docs/index.html:1462-1470: DiT-L/450M & DiT-G/1.2B flow matching over
ViTok latents, class-conditional with CFG): rectified-flow objective
``min E || v_theta(x_sigma, sigma, c) - (eps - z) ||^2`` with
``x_sigma = (1 - sigma) z + sigma eps``, uniform (optionally shifted) sigma
sampling, classifier-free-guidance label dropout, EMA, and the same
mesh-sharded optax machinery as the AE trainer.

Latents come either from a directory of precomputed ``.npy`` latent files
or on-the-fly from images through a (frozen) AE encoder.

    python scripts/train_dit.py --dit Bd4/256 --ae 350M-f16x64 \
        --data /imgs --bs 64 --steps 100000 --mesh data=4,fsdp=2
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit", default="Bd4/256")
    ap.add_argument("--ae", default=None,
                    help="AE (pretrained name/variant) to encode images; "
                    "omit if --data holds precomputed .npy latents")
    ap.add_argument("--data", required=True)
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--cfg-dropout", type=float, default=0.1)
    ap.add_argument("--shift", type=float, default=1.0,
                    help="sigma-shift of the training noise distribution")
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--checkpoint", type=int, default=0,
                    help="1 = remat the scanned DiT block body (DiT-L bs32 "
                    "needs it on a 16GB chip)")
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--schedule", default="cosine")
    ap.add_argument("--warmup-frac", type=float, default=0.05)
    ap.add_argument("--wd", type=float, default=0.0)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--optimizer", default="adamw", choices=["adamw", "muon"])
    ap.add_argument("--ema-decay", type=float, default=0.9999)
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--output-dir", default="./dit_runs")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log-freq", type=int, default=50)
    ap.add_argument("--save-freq", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from vitok_tpu.data import create_dataloader
    from vitok_tpu.models.dit import DiTConfig, apply as dit_apply
    from vitok_tpu.models.dit import decode_variant as dit_variant
    from vitok_tpu.models.dit import init_params as dit_init
    from vitok_tpu.parallel import (
        create_mesh,
        initialize_distributed,
        place_on_mesh,
        replicated,
        shard_batch,
        shard_params,
    )
    from vitok_tpu.train_lib import create_optimizer, create_schedule
    from vitok_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from vitok_tpu.utils.preemption import PreemptionGuard

    initialize_distributed()
    rank, world = jax.process_index(), jax.process_count()
    is_main = rank == 0
    mesh = create_mesh(
        None if args.mesh is None else {
            k: int(v) for k, _, v in
            (p.partition("=") for p in args.mesh.split(","))
        }
    )

    # --- frozen AE encoder (optional) ------------------------------------
    encode_fn = None
    code_width = None
    if args.ae:
        from vitok_tpu.models import AEConfig, init_params as ae_init
        from vitok_tpu.models.ae import encode_apply
        from vitok_tpu.pretrained import list_pretrained, load_pretrained_params

        if args.ae in list_pretrained():
            ae_cfg, ae_params = load_pretrained_params(args.ae, component="encoder")
        else:
            from vitok_tpu.models.ae import decode_variant

            ae_cfg = AEConfig.from_variant(args.ae, decoder=False)
            ae_params = ae_init(ae_cfg, jax.random.key(0))
        ae_params = jax.device_put(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), ae_params),
            replicated(mesh),
        )
        code_width = ae_cfg.channels_per_token
        encode_fn = jax.jit(
            lambda d: encode_apply(ae_params, d, ae_cfg, compute_dtype=jnp.bfloat16)
        )

    cfg = DiTConfig(
        **dit_variant(args.dit),
        code_width=code_width or 32,
        text_dim=args.num_classes,
        checkpoint=args.checkpoint,
    )
    # Real dp/fsdp/tp sharding (same path-based rules as the AE: qkv/fc1
    # column-parallel, out/fc2 row-parallel, misc kernels fsdp, rest
    # replicated).
    params = shard_params(dit_init(cfg, jax.random.key(args.seed)), mesh)

    schedule = create_schedule(args.schedule, args.lr, args.steps, args.warmup_frac)
    tx = create_optimizer(
        schedule, weight_decay=args.wd, grad_clip=args.grad_clip,
        optimizer=args.optimizer,
    )
    opt_state = place_on_mesh(tx.init(params), mesh)
    from vitok_tpu.parallel.sharding import batch_specs
    from jax.sharding import NamedSharding

    data_sharding = NamedSharding(mesh, batch_specs(mesh))
    ema = jax.tree_util.tree_map(lambda p: jnp.array(p, jnp.float32, copy=True), params)

    # --- flow-matching step ---------------------------------------------
    def loss_fn(p, z, labels, rng):
        b = z.shape[0]
        t_rng, e_rng, d_rng = jax.random.split(rng, 3)
        sigma = jax.random.uniform(t_rng, (b,))
        if args.shift != 1.0:
            sigma = args.shift * sigma / (1.0 + (args.shift - 1.0) * sigma)
        eps = jax.random.normal(e_rng, z.shape, z.dtype)
        x_sigma = (1.0 - sigma[:, None, None]) * z + sigma[:, None, None] * eps
        # CFG label dropout -> null class (index num_classes)
        drop = jax.random.bernoulli(d_rng, args.cfg_dropout, (b,))
        ctx = jnp.where(drop, args.num_classes, labels)
        v_pred = dit_apply(
            p,
            {"z": x_sigma, "t": sigma * 1000.0, "context": ctx},
            cfg,
            compute_dtype=jnp.bfloat16,
            deterministic=False,
        )
        target = eps - z
        return jnp.mean((v_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    @jax.jit
    def train_step(p, opt, ema_p, z, labels, rng, step_no):
        step_rng = jax.random.fold_in(rng, step_no)
        loss, grads = jax.value_and_grad(loss_fn)(p, z, labels, step_rng)
        updates, new_opt = tx.update(grads, opt, p)
        new_p = optax.apply_updates(p, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, q: e * args.ema_decay + q.astype(jnp.float32) * (1 - args.ema_decay),
            ema_p, new_p,
        )
        return new_p, new_opt, new_ema, loss

    # --- data ------------------------------------------------------------
    side = int(math.isqrt(args.max_tokens))

    def latent_batches():
        if encode_fn is None:
            files = sorted(
                os.path.join(args.data, f)
                for f in os.listdir(args.data)
                if f.endswith(".npy")
            )[rank::world]
            if not files:
                raise SystemExit(
                    f"--data {args.data} has no .npy latent files; pass "
                    "--ae <name-or-variant> to train from an image folder "
                    "(the frozen encoder produces latents on the fly)"
                )
            while True:
                order = list(files)
                np.random.default_rng(args.seed).shuffle(order)
                buf_z, buf_y = [], []
                for f in order:
                    d = np.load(f, allow_pickle=True).item()
                    buf_z.append(d["z"])
                    buf_y.append(d.get("label", 0))
                    if len(buf_z) == args.bs:
                        yield np.stack(buf_z), np.asarray(buf_y, np.int32)
                        buf_z, buf_y = [], []
        else:
            pp = (
                f"center_crop({side * args.patch})|to_tensor|"
                f"normalize(minus_one_to_one)|patchify({args.patch}, {args.max_tokens})"
            )
            loader = create_dataloader(
                args.data, pp, batch_size=args.bs, seed=args.seed,
                rank=rank, world=world, repeat=True, return_labels=True,
            )
            for batch in loader:
                jb = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
                enc = encode_fn(jb)
                yield np.asarray(enc["z"], np.float32), np.asarray(
                    batch.get("labels", np.zeros(args.bs)), np.int32
                )

    guard = PreemptionGuard()
    ckpt_dir = os.path.join(os.path.abspath(args.output_dir), "last")
    step = 0
    if args.resume and os.path.exists(ckpt_dir):
        restored = load_checkpoint(
            ckpt_dir,
            target={"params": params, "ema": ema, "opt": opt_state,
                    "step": jnp.int32(0)},
        )
        params = place_on_mesh(restored["params"], mesh)
        ema = place_on_mesh(restored["ema"], mesh)
        opt_state = place_on_mesh(restored["opt"], mesh)
        step = int(restored["step"])
        if is_main:
            print(f"resumed at step {step}")

    rng = jax.random.key(args.seed + 7)
    t_log = time.perf_counter()
    gen = latent_batches()
    while step < args.steps and not guard.should_stop:
        z_np, y_np = next(gen)
        z = jax.device_put(jnp.asarray(z_np), data_sharding)
        y = jax.device_put(jnp.asarray(y_np), data_sharding)
        params, opt_state, ema, loss = train_step(
            params, opt_state, ema, z, y, rng, jnp.int32(step)
        )
        step += 1
        if step % args.log_freq == 0 and is_main:
            dt = time.perf_counter() - t_log
            print(json.dumps({
                "step": step,
                "loss": round(float(loss), 5),
                "lr": round(float(schedule(step)), 7),
                "steps_per_s": round(args.log_freq / dt, 3),
            }))
            t_log = time.perf_counter()
        if (args.save_freq and step % args.save_freq == 0) or guard.should_stop:
            save_checkpoint(
                {"params": params, "ema": ema, "opt": opt_state,
                 "step": jnp.int32(step)},
                ckpt_dir,
            )
            if is_main:
                print(f"saved checkpoint at step {step}")
    save_checkpoint(
        {"params": params, "ema": ema, "opt": opt_state,
         "step": jnp.int32(step)},
        ckpt_dir,
    )
    if is_main:
        print("training done")


if __name__ == "__main__":
    main()
