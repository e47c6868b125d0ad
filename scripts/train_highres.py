"""High-resolution finetune CLI: token-sharded (sequence-parallel) training.

The regime SURVEY.md §5.7 identifies as the TPU build's structural edge:
finetuning at 1024p-8192p (4k-262k tokens/image) where one accelerator
cannot hold even a single image's activations. The token axis shards over
the ``seq`` mesh axis; sliding-window attention exchanges only its O(sw)
boundary keys/values per layer over ICI (``vitok_tpu.parallel.sequence``),
and the Charbonnier reconstruction backward runs fully token-sharded —
something the reference (single-GPU DDP/FSDP over the batch axis,
``scripts/train_vae.py``) structurally cannot do.

Deliberately the finetune subset of the main trainer: Charbonnier loss
only (SSIM tiles / DINO perceptual need gathered images — at 262k tokens
the gather is the thing we're avoiding), AdamW + EMA, Orbax resume. The
state layout matches ``train_lib.TrainState``, so a checkpoint from
``scripts/train_vae.py`` pretraining loads directly and the finetuned
result exports to the same safetensors interchange.

Single host (8 chips, one 2048p image per step = 16,384 tokens):
    python scripts/train_highres.py --data /imgs --seq 8 --sw 1024 \
        --res 2048 --bs 1 --steps 2000 --pretrained vitok-350M
Multi-host pods: same command per host (jax.distributed autoinit); the
``seq`` axis spans all chips.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

V5E_BF16_PEAK_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    # model
    ap.add_argument("--variant", default="Ld2-Ld22/1x16x64")
    ap.add_argument("--sw", type=int, required=True,
                    help="sliding window (halo size; required — global "
                    "attention does not token-shard)")
    ap.add_argument("--checkpoint", type=int, default=0)
    ap.add_argument("--remat-save", default="")
    ap.add_argument("--pretrained", default=None,
                    help="pretrained name to finetune from")
    ap.add_argument("--init-ckpt", default=None,
                    help="Orbax checkpoint dir from scripts/train_vae.py "
                    "pretraining to start from (params + EMA)")
    # data
    ap.add_argument("--data", required=True)
    ap.add_argument("--pp", default=None)
    ap.add_argument("--res", type=int, default=1024,
                    help="finetune resolution (square crop)")
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--bs", type=int, default=1,
                    help="images per step per process")
    # optimization
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--schedule", default="cosine")
    ap.add_argument("--warmup-frac", type=float, default=0.05)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--ema-decay", type=float, default=0.999)
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--drop-path", type=float, default=0.0)
    # parallelism
    ap.add_argument("--seq", type=int, default=None,
                    help="token shards (default: all visible devices)")
    # io / cadence
    ap.add_argument("--output-dir", default="./output_highres")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log-freq", type=int, default=10)
    ap.add_argument("--save-freq", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from vitok_tpu.data import create_dataloader
    from vitok_tpu.models import AEConfig, init_params, num_params
    from vitok_tpu.parallel import create_mesh, initialize_distributed
    from vitok_tpu.parallel.sequence import (
        SEQ_AXIS,
        make_sp_train_step,
        place_batch_token_sharded,
    )
    from vitok_tpu.train_lib import (
        create_optimizer,
        create_schedule,
        create_train_state,
    )
    from vitok_tpu.utils.checkpoint import (
        export_safetensors,
        load_checkpoint,
        save_checkpoint,
    )

    initialize_distributed()
    rank, world = jax.process_index(), jax.process_count()
    is_main = rank == 0

    n_seq = args.seq or len(jax.devices())
    mesh = create_mesh({SEQ_AXIS: n_seq}, devices=jax.devices()[:n_seq])

    tokens = (args.res // args.patch) ** 2
    if tokens % n_seq:
        raise SystemExit(
            f"tokens {tokens} (res {args.res}, patch {args.patch}) not "
            f"divisible by seq={n_seq}"
        )
    if args.sw > tokens // n_seq:
        raise SystemExit(
            f"--sw {args.sw} exceeds tokens per shard {tokens // n_seq}; "
            "the halo exchange needs sw <= local tokens"
        )
    if is_main:
        print(f"seq mesh: {n_seq} shards, {tokens} tokens/img "
              f"({tokens // n_seq}/shard), sw={args.sw}")

    # --- model + state -----------------------------------------------------
    cfg = AEConfig.from_variant(
        args.variant,
        checkpoint=args.checkpoint,
        remat_save=tuple(
            s.strip() for s in args.remat_save.split(",") if s.strip()
        ),
        sw=args.sw,
        drop_path_rate=args.drop_path,
    )
    if args.pretrained:
        from vitok_tpu.pretrained import load_pretrained_params

        _, raw = load_pretrained_params(args.pretrained)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x), raw)
    else:
        params = init_params(cfg, jax.random.key(args.seed))
    n_params = num_params(params)

    schedule = create_schedule(
        args.schedule, args.lr, args.steps, args.warmup_frac
    )
    tx = create_optimizer(
        schedule, weight_decay=args.wd, grad_clip=args.grad_clip
    )
    state = create_train_state(params, tx, ema=not args.no_ema)
    if args.init_ckpt:
        # Warm-start params (+EMA) from a pretraining checkpoint; the
        # optimizer state and step restart fresh for the finetune schedule.
        import dataclasses

        pre = load_checkpoint(args.init_ckpt, target=state)
        state = dataclasses.replace(
            state,
            params=pre.params,
            ema_params=pre.ema_params if state.ema_params is not None else None,
        )
        if is_main:
            print(f"warm-started params from {args.init_ckpt}")

    ckpt_dir = os.path.join(os.path.abspath(args.output_dir), "last")
    if args.resume and os.path.exists(ckpt_dir):
        state = load_checkpoint(ckpt_dir, target=state)
        if is_main:
            print(f"resumed at step {int(state.step)}")

    # Replicate the state over the seq mesh (params/optimizer are replicated
    # in sequence parallelism; restored checkpoints arrive single-device
    # committed, which would conflict with the token-sharded batch under jit).
    from jax.sharding import NamedSharding, PartitionSpec

    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    # --- data ----------------------------------------------------------------
    pp = args.pp or (
        f"random_resized_crop({args.res})|flip|to_tensor|"
        f"normalize(minus_one_to_one)|patchify({args.patch}, {tokens})"
    )
    loader = create_dataloader(
        args.data, pp,
        batch_size=args.bs,
        seed=args.seed,
        rank=rank, world=world,
        repeat=True,
    )

    train_step = make_sp_train_step(
        cfg, tx, mesh,
        ema_decay=args.ema_decay,
        stochastic=args.drop_path > 0.0,
    )

    # --- loop ----------------------------------------------------------------
    from vitok_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()
    rng = jax.random.key(args.seed + 1)
    step = int(state.step)
    loader_iter = iter(loader)
    t_log = time.perf_counter()
    while step < args.steps:
        try:
            batch = next(loader_iter)
        except StopIteration:
            loader_iter = iter(loader)
            batch = next(loader_iter)
        batch = place_batch_token_sharded(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
            mesh,
        )

        state, metrics = train_step(state, batch, rng)
        step += 1

        if step % args.log_freq == 0:
            jax.block_until_ready(metrics)
            dt = time.perf_counter() - t_log
            steps_per_s = args.log_freq / dt
            tokens_per_s = steps_per_s * args.bs * tokens * world
            mfu = 6 * n_params * tokens_per_s / (
                V5E_BF16_PEAK_FLOPS * len(jax.devices())
            )
            log = {k: float(v) for k, v in metrics.items()}
            log.update({
                "lr": float(schedule(step)),
                "timing/steps_per_s": steps_per_s,
                "perf/mfu": mfu,
                "perf/tokens_per_s": tokens_per_s,
            })
            if is_main:
                print(f"step {step}: " + json.dumps(
                    {k: round(v, 5) for k, v in log.items()}))
            t_log = time.perf_counter()

        if args.save_freq and step % args.save_freq == 0:
            save_checkpoint(state, ckpt_dir)
            if is_main:
                print(f"saved checkpoint at step {step}")

        if guard.should_stop:
            save_checkpoint(state, ckpt_dir)
            if is_main:
                print(f"preempted: checkpoint saved at step {step}")
            return

    save_checkpoint(state, ckpt_dir)
    export_dir = os.path.join(os.path.abspath(args.output_dir), "safetensors")
    written = export_safetensors(
        state.ema_params if state.ema_params is not None else state.params,
        export_dir,
    )
    if is_main:
        print("finetune done;", "exported:", written)


if __name__ == "__main__":
    main()
