"""Training CLI: NaFlex tokenizer training with dp/fsdp/tp sharding.

Capability parity with reference ``scripts/train_vae.py`` (Na-VAE/vitok-release):
same flags where they make sense (variant, data, pp, losses, schedule,
checkpointing, eval/save/log cadence), same loss stack (masked Charbonnier +
SSIM tiles + optional perceptual), MFU logging — but the distributed
substrate is a ``(data, fsdp, model)`` mesh with pjit-sharded params/optimizer
instead of DDP/FSDP2 wrappers, and checkpoints are Orbax (sharded, resumable)
with safetensors export.

Single host:
    python scripts/train_vae.py --variant Ld2-Ld22/1x16x64 --data /imgs \
        --bs 32 --steps 1000 --mesh data=4,fsdp=2
Multi-host TPU pods: same command on every host (jax.distributed autoinit).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

V5E_BF16_PEAK_FLOPS = 197e12


def parse_mesh(spec: str):
    if not spec:
        return None
    axes = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        axes[k.strip()] = int(v)
    return axes


def main():
    ap = argparse.ArgumentParser()
    # model
    ap.add_argument("--variant", default="Ld2-Ld22/1x16x64")
    ap.add_argument("--checkpoint", type=int, default=0,
                    help="gradient-checkpoint every k-th block (0=off, "
                    "-1=per-layer unrolled remat: fastest measured step "
                    "but depth-specialized ~5min compile)")
    ap.add_argument("--remat-save", default="",
                    help="comma list of intermediates to KEEP under remat "
                    "(qkv_out,ffn_hid,attn_out); cuts the recompute tax of "
                    "--checkpoint 1 without the k>1 structural grouping")
    ap.add_argument("--sw", type=int, default=None, help="sliding window")
    ap.add_argument("--pretrained", default=None,
                    help="pretrained name to finetune from")
    # data
    ap.add_argument("--data", required=True)
    ap.add_argument("--pp", default=None)
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument(
        "--bs", type=int, default=32,
        help="per-process batch size (global batch = bs x num processes)",
    )
    ap.add_argument(
        "--grad-accum", type=int, default=1,
        help="microbatch accumulation: split each bs-sized batch into this "
             "many sequential microbatches (one optimizer update per step; "
             "peak activation memory ~ bs/grad_accum)",
    )
    # optimization
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--schedule", default="cosine")
    ap.add_argument("--warmup-frac", type=float, default=0.05)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--b1", type=float, default=0.9)
    ap.add_argument("--b2", type=float, default=0.99)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--optimizer", default="adamw", choices=["adamw", "muon"])
    ap.add_argument("--momentum", type=float, default=0.95,
                    help="muon momentum (reference default)")
    ap.add_argument("--moment-dtype", default=None, choices=[None, "bf16"],
                    help="store AdamW's first moment in bf16 (less optimizer "
                    "HBM traffic per step; nu stays fp32)")
    ap.add_argument("--ema-decay", type=float, default=0.999)
    ap.add_argument("--no-ema", action="store_true")
    # losses (reference defaults train_vae.py:68-75)
    ap.add_argument("--charbonnier-weight", type=float, default=1.0)
    ap.add_argument("--ssim-weight", type=float, default=0.1)
    ap.add_argument("--perceptual-weight", type=float, default=0.0,
                    help="DINO feature loss weight (reference uses 500.0)")
    ap.add_argument("--tile-size", type=int, default=256)
    ap.add_argument("--n-tiles", type=int, default=2)
    ap.add_argument("--dino-weights", default=None,
                    help="timm-named DINO ViT state dict (.pth/.safetensors);"
                         " defaults to $VITOK_DINO_WEIGHTS, else random init")
    ap.add_argument("--dino-size", default="S", choices=["S", "B"])
    ap.add_argument("--drop-path", type=float, default=0.0)
    # parallelism
    ap.add_argument("--mesh", default=None,
                    help="e.g. 'data=4,fsdp=2', 'data=2,fsdp=2,model=2', "
                    "'pipe=4' (GPipe decoder pipeline + data-parallel "
                    "encoder), or 'data=2,pipe=4' (DP replicas of the pipe "
                    "group); pipe meshes run the full Charbonnier+SSIM"
                    "+perceptual loss stack")
    ap.add_argument("--pipe-microbatches", type=int, default=None,
                    help="GPipe microbatches for --mesh pipe=K (default K; "
                    "more microbatches amortize the pipeline bubble)")
    # io / cadence
    ap.add_argument("--output-dir", default="./output")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log-freq", type=int, default=50)
    ap.add_argument("--eval-freq", type=int, default=0)
    ap.add_argument("--save-freq", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--wandb", default=None, help="wandb project name")
    args = ap.parse_args()

    from vitok_tpu.data import create_dataloader
    from vitok_tpu.models import AEConfig, init_params, num_params
    from vitok_tpu.parallel import (
        create_mesh,
        initialize_distributed,
        place_on_mesh,
        shard_batch,
        shard_params,
    )
    from vitok_tpu.train_lib import (
        LossConfig,
        TrainState,
        create_optimizer,
        create_schedule,
        create_train_state,
        make_train_step,
    )
    from vitok_tpu.utils.checkpoint import (
        export_safetensors,
        load_checkpoint,
        save_checkpoint,
    )

    initialize_distributed()
    rank = jax.process_index()
    world = jax.process_count()
    is_main = rank == 0

    mesh = create_mesh(parse_mesh(args.mesh))
    if is_main:
        print(f"mesh: {dict(mesh.shape)}, devices: {len(jax.devices())}")

    pipe_stages = dict(mesh.shape).get("pipe", 1)
    if pipe_stages > 1:
        others = {
            k: v
            for k, v in mesh.shape.items()
            if k not in ("pipe", "data") and v > 1
        }
        if others:
            raise SystemExit(
                "--mesh pipe=K composes with data=D only (DP replicas of "
                f"the pipe group), got extra {others}"
            )
        if args.drop_path:
            raise SystemExit(
                "--drop-path requires per-(microbatch, layer) rng inside the "
                "rotating GPipe schedule; pipeline training runs with 0 "
                "(the reference's high-res finetune regime)"
            )

    # --- model + state ---------------------------------------------------
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
    if pipe_stages > 1:
        from vitok_tpu.parallel import pipeline_param_specs

        params = shard_params(params, mesh, spec_fn=pipeline_param_specs(mesh))
    else:
        params = shard_params(params, mesh)
    n_params = num_params(params)

    schedule = create_schedule(
        args.schedule, args.lr, args.steps, args.warmup_frac
    )
    tx = create_optimizer(
        schedule, weight_decay=args.wd, b1=args.b1, b2=args.b2,
        grad_clip=args.grad_clip, optimizer=args.optimizer,
        momentum=args.momentum,
        moment_dtype=jnp.bfloat16 if args.moment_dtype == "bf16" else None,
    )
    state = create_train_state(params, tx, ema=not args.no_ema)
    state = place_on_mesh(state, mesh)

    ckpt_dir = os.path.join(os.path.abspath(args.output_dir), "last")
    if args.resume and os.path.exists(ckpt_dir):
        state = place_on_mesh(load_checkpoint(ckpt_dir, target=state), mesh)
        if is_main:
            print(f"resumed at step {int(state.step)}")

    # --- data ------------------------------------------------------------
    grid_side = int(math.isqrt(args.max_tokens))
    pp = args.pp or (
        f"random_choice(['random_resized_crop({grid_side * args.patch})',"
        f" 'identity'], [0.25, 0.75])|flip|to_tensor|"
        f"normalize(minus_one_to_one)|"
        f"resize_to_token_budget({args.patch}, {args.max_tokens})|"
        f"patchify({args.patch}, {args.max_tokens})"
    )
    loader = create_dataloader(
        args.data, pp,
        batch_size=args.bs,
        seed=args.seed,
        rank=rank, world=world,
        repeat=True,
    )

    loss_cfg = LossConfig(
        charbonnier_weight=args.charbonnier_weight,
        ssim_weight=args.ssim_weight,
        perceptual_weight=args.perceptual_weight,
        tile_size=args.tile_size,
        n_tiles=args.n_tiles,
        patch=args.patch,
        ssim_grid=(grid_side, grid_side)
        if (args.ssim_weight or args.perceptual_weight)
        else None,
    )

    # DINO perceptual backbone (reference train_vae.py:254-259: frozen
    # DINOPerceptual('S', tile_size) compiled alongside the model).
    feature_fn = None
    if args.perceptual_weight:
        from vitok_tpu.models.vit_features import (
            load_dino_backbone,
            make_dino_feature_fn,
        )

        dino_params, dino_cfg = load_dino_backbone(
            args.dino_weights or os.environ.get("VITOK_DINO_WEIGHTS"),
            size=args.dino_size,
        )
        feature_fn = make_dino_feature_fn(
            dino_params, dino_cfg, target_size=args.tile_size
        )
        if is_main:
            src = args.dino_weights or os.environ.get("VITOK_DINO_WEIGHTS")
            print(f"DINO perceptual: ViT-{args.dino_size} "
                  f"({'weights=' + src if src else 'RANDOM INIT'})")

    if pipe_stages > 1:
        from vitok_tpu.parallel import make_pipeline_train_step

        train_step = make_pipeline_train_step(
            cfg, tx, mesh,
            num_microbatches=args.pipe_microbatches,
            ema_decay=args.ema_decay,
            loss_cfg=loss_cfg
            if (args.ssim_weight or args.perceptual_weight)
            else None,
            feature_fn=feature_fn,
            grad_accum=args.grad_accum,
        )
    else:
        train_step = make_train_step(
            cfg, tx, loss_cfg, ema_decay=args.ema_decay,
            feature_fn=feature_fn, grad_accum=args.grad_accum,
        )

    wandb_run = None
    if args.wandb and is_main:
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb, config=vars(args))
        except ImportError:
            print("wandb not installed; console logging only")

    # --- loop ------------------------------------------------------------
    from vitok_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()
    eval_fn = None  # built once on first eval (jit cache must persist)
    rng = jax.random.key(args.seed + 1)
    step = int(state.step)
    loader_iter = iter(loader)
    t_log = time.perf_counter()
    data_ms = 0.0
    while step < args.steps:
        t0 = time.perf_counter()
        try:
            batch = next(loader_iter)
        except StopIteration:
            loader_iter = iter(loader)
            batch = next(loader_iter)
        batch = shard_batch(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
            mesh,
        )
        data_ms += (time.perf_counter() - t0) * 1e3

        state, metrics = train_step(state, batch, rng)
        step += 1

        if step % args.log_freq == 0:
            jax.block_until_ready(metrics)
            dt = time.perf_counter() - t_log
            steps_per_s = args.log_freq / dt
            tokens_per_s = steps_per_s * args.bs * args.max_tokens * world
            mfu = 6 * n_params * tokens_per_s / (
                V5E_BF16_PEAK_FLOPS * len(jax.devices())
            )
            log = {k: float(v) for k, v in metrics.items()}
            log.update({
                "lr": float(schedule(step)),
                "timing/steps_per_s": steps_per_s,
                "timing/data_ms_per_step": data_ms / args.log_freq,
                "perf/mfu": mfu,
                "perf/samples_per_s": steps_per_s * args.bs * world,
            })
            if is_main:
                print(f"step {step}: " + json.dumps(
                    {k: round(v, 5) for k, v in log.items()}))
                if wandb_run:
                    wandb_run.log(log, step=step)
            t_log = time.perf_counter()
            data_ms = 0.0

        if args.eval_freq and step % args.eval_freq == 0:
            # Quick reconstruction eval on a few batches (reference
            # train_vae.py:434-487): SSIM/PSNR on masked reconstructions.
            from vitok_tpu.losses import psnr as psnr_fn, ssim as ssim_fn
            from vitok_tpu.models.ae import forward_apply as fwd_apply
            from vitok_tpu.train_lib import unpatchify_dense_static

            if eval_fn is None:
                eval_fn = jax.jit(
                    lambda p, d: fwd_apply(p, d, cfg, compute_dtype=jnp.bfloat16)
                )
            ssim_vals, psnr_vals = [], []
            eval_iter = iter(loader)
            for _ in range(4):
                try:
                    eb = next(eval_iter)
                except StopIteration:
                    break
                jb = shard_batch(
                    {k: v for k, v in eb.items() if isinstance(v, np.ndarray)},
                    mesh,
                )
                out = eval_fn(state.params, jb)
                rec = unpatchify_dense_static(
                    dict(out), grid_side, grid_side, args.patch
                )
                ref_img = unpatchify_dense_static(
                    dict(jb), grid_side, grid_side, args.patch
                )
                ssim_vals.append(float(ssim_fn(ref_img, rec)))
                psnr_vals.append(float(psnr_fn(ref_img, rec)))
            if is_main and ssim_vals:
                ev = {
                    "eval/ssim": sum(ssim_vals) / len(ssim_vals),
                    "eval/psnr": sum(psnr_vals) / len(psnr_vals),
                }
                print(f"step {step} eval: " + json.dumps(
                    {k: round(v, 4) for k, v in ev.items()}))
                if wandb_run:
                    wandb_run.log(ev, step=step)

        if args.save_freq and step % args.save_freq == 0:
            save_checkpoint(state, ckpt_dir)
            if is_main:
                print(f"saved checkpoint at step {step}")

        if guard.should_stop:
            # Preemption (SIGTERM) or Ctrl-C: save and exit cleanly.
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
        print("training done;", "exported:", written)


if __name__ == "__main__":
    main()
