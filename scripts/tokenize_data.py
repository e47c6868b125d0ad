"""Bulk tokenization CLI: images -> ViTok latents (and back).

The production serving use of the tokenizer (reference README "Quick
Start", Na-VAE/vitok-release README.md:47-65, scaled out): stream a
dataset through the jitted encoder and persist latent shards, or decode
latent shards back to images. Static-shape batches (one ``max_tokens``
pad) keep a single compiled program per direction.

Usage:
    # images -> latent shards (.npz per batch: z fp16 + NaFlex metadata)
    python scripts/tokenize_data.py encode --model 350M-f16x64 \
        --data /path/to/imgs --output /path/to/latents --batch-size 32

    # latent shards -> PNGs
    python scripts/tokenize_data.py decode --model 350M-f16x64 \
        --data /path/to/latents --output /path/to/recons
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import json
import os
import time

import ml_dtypes
import numpy as np

import jax
import jax.numpy as jnp

_META = (
    "patch_mask", "row_idx", "col_idx",
    "orig_height", "orig_width", "grid_rows", "grid_cols",
)


def _load_model(args):
    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.pretrained import list_pretrained

    if args.model in list_pretrained() and not args.random_weights:
        from vitok_tpu.pretrained import load_pretrained_params

        cfg, params = load_pretrained_params(args.model)
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16), params
        )
    else:
        variant = args.model
        if args.model in list_pretrained():
            from vitok_tpu.pretrained import get_pretrained_info

            variant = get_pretrained_info(args.model)[2]
        cfg = AEConfig.from_variant(variant)
        params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    if args.quant:
        from vitok_tpu.ops.quant import quantize_block_params_device

        params = quantize_block_params_device(params)
    return cfg, params


def encode(args) -> None:
    from vitok_tpu.data import create_dataloader
    from vitok_tpu.models.ae import encode_apply

    cfg, params = _load_model(args)
    max_tokens = args.max_tokens or (args.max_size // cfg.spatial_stride) ** 2
    pp = (
        f"resize_longest_side({args.max_size})|to_tensor|"
        f"normalize(minus_one_to_one)|"
        f"resize_to_token_budget({cfg.spatial_stride}, {max_tokens})|"
        f"patchify({cfg.spatial_stride}, {max_tokens})"
    )
    loader = create_dataloader(
        args.data, pp,
        batch_size=args.batch_size,
        seed=args.seed,
        num_samples=args.num_samples,
        partial=True,  # a bulk tokenizer must not drop the ragged tail
        decode_workers=args.decode_workers,
    )
    enc = jax.jit(lambda p, d: encode_apply(p, d, cfg))

    os.makedirs(args.output, exist_ok=True)
    n_images = 0
    t0 = time.perf_counter()
    for i, batch in enumerate(loader):
        # Patches upload as bf16: the encoder computes in bf16 anyway, so
        # this halves host->device bytes — the dominant cost on
        # bandwidth-limited links (measured 2x tokenize throughput on the
        # remote tunnel, BASELINE_NOTE.md round 5).
        jbatch = {
            k: jnp.asarray(
                v.astype(ml_dtypes.bfloat16)
                if k == "patches" and v.dtype == np.float32
                else v
            )
            for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }
        out = enc(params, jbatch)
        shard = {"z": np.asarray(out["z"], np.float16)}
        for key in _META:
            if key in out:
                shard[key] = np.asarray(out[key])
        np.savez(os.path.join(args.output, f"latents_{i:06d}.npz"), **shard)
        n_images += shard["z"].shape[0]
    dt = time.perf_counter() - t0
    stats = {
        "mode": "encode", "model": args.model, "n_images": n_images,
        "shards": i + 1, "wall_s": round(dt, 2),
        "img_per_s": round(n_images / max(dt, 1e-9), 2),
        "latent_shape": list(np.asarray(out["z"]).shape[1:]),
        "output": args.output,
    }
    print(json.dumps(stats))


def decode(args) -> None:
    from vitok_tpu.models.ae import decode_apply
    from vitok_tpu.pp import postprocess

    cfg, params = _load_model(args)
    dec = jax.jit(lambda p, d: decode_apply(p, d, cfg))

    os.makedirs(args.output, exist_ok=True)
    shards = sorted(glob.glob(os.path.join(args.data, "latents_*.npz")))
    if not shards:
        raise FileNotFoundError(f"no latents_*.npz under {args.data}")
    n_images = 0
    t0 = time.perf_counter()
    for shard_path in shards:
        with np.load(shard_path) as f:
            d = {k: f[k] for k in f.files}
        d["z"] = d["z"].astype(np.float32)
        out = dec(params, {k: jnp.asarray(v) for k, v in d.items()})
        images = postprocess(
            dict(out), output_format="0_255", do_unpack=True,
            patch=cfg.spatial_stride,
        )
        from PIL import Image

        for img in images:
            arr = np.asarray(img).transpose(1, 2, 0).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(args.output, f"img_{n_images:06d}.png")
            )
            n_images += 1
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": "decode", "model": args.model, "n_images": n_images,
        "wall_s": round(dt, 2),
        "img_per_s": round(n_images / max(dt, 1e-9), 2),
        "output": args.output,
    }))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["encode", "decode"])
    ap.add_argument("--model", required=True,
                    help="pretrained name (350M-f16x64) or variant string")
    ap.add_argument("--data", required=True,
                    help="encode: image folder/tars/HF set; decode: latent dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--decode-workers", type=int, default=0,
                    help="threaded JPEG-decode pool (0 = serial)")
    ap.add_argument("--max-size", type=int, default=256)
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--num-samples", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quant", action="store_true",
                    help="int8-quantize block weights")
    ap.add_argument("--random-weights", action="store_true",
                    help="skip checkpoint load (pipeline smoke)")
    args = ap.parse_args()
    (encode if args.mode == "encode" else decode)(args)


if __name__ == "__main__":
    main()
