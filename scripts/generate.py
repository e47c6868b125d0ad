"""Class-conditional image generation: DiT flow matching over ViTok latents.

The end-to-end sampling pipeline the reference documents but never shipped
(SURVEY.md §3.5): UniPC flow sampling of DiT latents with classifier-free
guidance, decoded to pixels by the ViTok decoder.

    python scripts/generate.py --ae 350M-f16x64 --classes 207,360 \
        --steps 20 --cfg-scale 4.0 --out samples/
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import os

import numpy as np

import jax
import jax.numpy as jnp


def sample_latents_device(
    dit,
    scheduler,
    classes,
    n_tokens: int,
    code_width: int,
    cfg_scale: float = 4.0,
    steps: int = 20,
    seed: int = 0,
):
    """TPU-native sampling: the whole UniPC loop in ONE jitted program.

    CFG batch doubling runs inside the loop body; no host<->device sync
    between steps (the host loop pays a latents fetch + re-upload per step
    — pure tunnel latency on a remote runtime). Numerics equal to
    ``sample_latents`` to float tolerance (tests/test_dit_unipc.py).
    """
    from vitok_tpu.models.dit import apply as dit_apply
    from vitok_tpu.unipc import sample_flow_unipc_device

    b = len(classes)
    side = int(math.isqrt(n_tokens))
    rng = jax.random.key(seed)
    z0 = jax.random.normal(rng, (b, n_tokens, code_width), jnp.float32)

    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    row = jnp.tile(jnp.asarray(yy.ravel())[None], (2 * b, 1))
    col = jnp.tile(jnp.asarray(xx.ravel())[None], (2 * b, 1))
    ctx = jnp.concatenate([
        jnp.asarray(classes, jnp.int32),
        jnp.full((b,), dit.text_dim, jnp.int32),
    ])
    params, cfg = dit.params, dit.cfg

    # params are a jit ARGUMENT — closing over them would bake the weights
    # into the HLO as constants (oversized programs; the remote compile
    # helper rejects them).
    def v_fn(p, z, t):
        z_in = jnp.concatenate([z, z])
        t_in = jnp.full((2 * b,), 1.0, jnp.float32) * t
        v = dit_apply(
            p,
            {"z": z_in, "t": t_in, "context": ctx,
             "row_idx": row, "col_idx": col},
            cfg,
            compute_dtype=dit.compute_dtype,
        ).astype(jnp.float32)
        cond, uncond = v[:b], v[b:]
        return uncond + cfg_scale * (cond - uncond)

    run = jax.jit(
        lambda p, z: sample_flow_unipc_device(
            lambda zz, t: v_fn(p, zz, t), z, scheduler=scheduler, steps=steps
        )
    )
    return run(params, z0)


def sample_latents(
    dit,
    scheduler,
    classes,
    n_tokens: int,
    code_width: int,
    cfg_scale: float = 4.0,
    steps: int = 20,
    seed: int = 0,
):
    """UniPC sampling loop with CFG batch doubling. Returns z [B, N, c]."""
    b = len(classes)
    side = int(math.isqrt(n_tokens))
    rng = jax.random.key(seed)
    z = jax.random.normal(rng, (b, n_tokens, code_width), jnp.float32)

    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    row = jnp.tile(jnp.asarray(yy.ravel())[None], (2 * b, 1))
    col = jnp.tile(jnp.asarray(xx.ravel())[None], (2 * b, 1))
    ctx = jnp.concatenate([
        jnp.asarray(classes, jnp.int32),
        jnp.full((b,), dit.text_dim, jnp.int32),  # null class
    ])

    scheduler.set_timesteps(steps)
    for t in scheduler.timesteps:
        z_in = jnp.concatenate([z, z])
        t_in = jnp.full((2 * b,), float(t), jnp.float32)
        v = dit({
            "z": z_in, "t": t_in, "context": ctx,
            "row_idx": row, "col_idx": col,
        })
        cond, uncond = v[:b], v[b:]
        guided = uncond + cfg_scale * (cond - uncond)
        z = jnp.asarray(
            scheduler.step(np.asarray(guided, np.float32), t,
                           np.asarray(z, np.float32)).prev_sample
        )
    return z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae", default="350M-f16x64",
                    help="pretrained AE name or variant string")
    ap.add_argument("--dit-variant", default="Bd4/256")
    ap.add_argument("--dit-checkpoint", default=None,
                    help="orbax/safetensors DiT weights (random if absent)")
    ap.add_argument("--classes", default="0")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfg-scale", type=float, default=4.0)
    ap.add_argument("--shift", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="samples")
    ap.add_argument("--device-loop", action="store_true",
                    help="run the whole UniPC loop in one jitted program "
                    "(no host sync between steps; same numerics)")
    args = ap.parse_args()

    from PIL import Image

    from vitok_tpu.models import AE, AEConfig, decode_variant, init_params
    from vitok_tpu.models.dit import DiT, decode_variant as dit_variant
    from vitok_tpu.pp import postprocess
    from vitok_tpu.pretrained import list_pretrained, load_pretrained_params
    from vitok_tpu.unipc import FlowUniPCMultistepScheduler

    # --- decoder ---------------------------------------------------------
    if args.ae in list_pretrained():
        cfg, params = load_pretrained_params(args.ae, component="decoder")
        model = AE(params=params, **cfg.__dict__)
    else:
        model = AE(**decode_variant(args.ae))
    code_width = model.channels_per_token

    # --- DiT -------------------------------------------------------------
    dit = DiT(
        **dit_variant(args.dit_variant),
        code_width=code_width,
        text_dim=1000,
        compute_dtype=jnp.bfloat16,
    )
    if args.dit_checkpoint:
        from vitok_tpu.utils.checkpoint import load_checkpoint

        dit.params = load_checkpoint(args.dit_checkpoint)

    classes = [int(c) for c in args.classes.split(",")]
    sched = FlowUniPCMultistepScheduler(shift=args.shift)
    sampler = sample_latents_device if args.device_loop else sample_latents
    z = sampler(
        dit, sched, classes, args.tokens, code_width,
        cfg_scale=args.cfg_scale, steps=args.steps, seed=args.seed,
    )

    # --- decode to pixels ------------------------------------------------
    side = int(math.isqrt(args.tokens))
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    b = len(classes)
    dec_in = {
        "z": z,
        "patch_mask": jnp.ones((b, args.tokens), bool),
        "row_idx": jnp.tile(jnp.asarray(yy.ravel())[None], (b, 1)),
        "col_idx": jnp.tile(jnp.asarray(xx.ravel())[None], (b, 1)),
        "orig_height": jnp.full((b,), side * model.spatial_stride, jnp.int32),
        "orig_width": jnp.full((b,), side * model.spatial_stride, jnp.int32),
    }
    out = model.decode(dec_in)
    images = postprocess(
        dict(out), output_format="0_255", do_unpack=True,
        patch=model.spatial_stride,
    )
    os.makedirs(args.out, exist_ok=True)
    for cls, img in zip(classes, images):
        path = os.path.join(args.out, f"class{cls}_seed{args.seed}.png")
        Image.fromarray(np.asarray(img).transpose(1, 2, 0)).save(path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
