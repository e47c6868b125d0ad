"""Golden-parity harness: released checkpoints, our model vs torch reference.

The analog of reference ``tests/gpu/test_v2_comparison.py``: load the same
safetensors weights into (a) the torch reference AE (sdpa backend, CPU) and
(b) our stacked-pytree model, push identical NaFlex batches through both,
and report weight/latent/output max-abs diffs against the reference's own
thresholds (1e-4 weights, 0.1 outputs — test_v2_comparison.py:571-589).

Works with any of the 9 released checkpoints when weights are available
(network or VITOK_PRETRAINED_DIR); the per-op/random-weight version of this
parity check runs in CI (tests/test_ae.py::TestReferenceParity).

    python scripts/compare_reference.py --model 350M-f16x64 \
        --reference /root/reference --image path/to/img.jpg
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import types


def load_reference_modules(reference_root: str):
    """Import the torch reference model package with a stub parent (its
    top-level __init__ needs torchvision, absent here)."""
    if "vitok" not in sys.modules:
        stub = types.ModuleType("vitok")
        stub.__path__ = [f"{reference_root}/vitok"]
        sys.modules["vitok"] = stub
    import importlib

    return importlib.import_module("vitok.models.ae")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="350M-f16x64")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--image", default=None,
                    help="image to roundtrip (synthetic batch if absent)")
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--weight-tol", type=float, default=1e-4)
    ap.add_argument("--output-tol", type=float, default=0.1)
    args = ap.parse_args()

    import numpy as np
    import torch

    import jax.numpy as jnp

    from vitok_tpu.models import AEConfig
    from vitok_tpu.models.ae import decode_apply, encode_apply
    from vitok_tpu.pretrained import load_pretrained
    from vitok_tpu.utils.params_io import torch_state_to_pytree

    ref_mod = load_reference_modules(args.reference)

    raw = load_pretrained(args.model)
    variant = raw["variant"]
    flat = {**raw.get("encoder", {}), **raw.get("decoder", {})}

    # --- build both models from the same weights -------------------------
    torch_model = ref_mod.AE(
        **ref_mod.decode_variant(variant), attn_backend="sdpa"
    ).eval()
    torch_model.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in flat.items()}
    )
    cfg = AEConfig.from_variant(variant, attn_impl="xla")
    params = torch_state_to_pytree(flat, cfg)

    # weight parity (via re-export)
    from vitok_tpu.utils.params_io import pytree_to_torch_state

    re_exported = pytree_to_torch_state(params)
    w_diff = max(
        float(np.abs(np.asarray(re_exported[k]) - np.asarray(v)).max())
        for k, v in flat.items()
    )

    # --- batch -----------------------------------------------------------
    if args.image:
        from PIL import Image

        from vitok_tpu.pp import preprocess

        batch = preprocess(
            Image.open(args.image),
            pp=(
                "to_tensor|normalize(minus_one_to_one)|"
                f"resize_to_token_budget({cfg.spatial_stride}, {args.max_tokens})|"
                f"patchify({cfg.spatial_stride}, {args.max_tokens})"
            ),
            device="cpu",
        )
    else:
        rng = np.random.default_rng(0)
        side = int(np.sqrt(args.max_tokens))
        yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
        n = args.max_tokens
        batch = {
            "patches": jnp.asarray(
                rng.standard_normal((1, n, cfg.pixels_per_token)).astype(
                    np.float32
                )
            ),
            "patch_mask": jnp.ones((1, n), bool),
            "row_idx": jnp.asarray(yy.ravel()[None].astype(np.int32)),
            "col_idx": jnp.asarray(xx.ravel()[None].astype(np.int32)),
            "orig_height": jnp.array([side * cfg.spatial_stride]),
            "orig_width": jnp.array([side * cfg.spatial_stride]),
        }

    tb = {
        k: torch.tensor(np.asarray(v)) for k, v in batch.items()
    }
    tb["patch_mask"] = tb["patch_mask"].bool()

    with torch.no_grad():
        t_enc = torch_model.encode(tb)
        t_out = torch_model.decode(t_enc)

    j_enc = encode_apply(params, batch, cfg, compute_dtype=jnp.float32)
    j_out = decode_apply(params, j_enc, cfg, compute_dtype=jnp.float32)

    mask = np.asarray(batch["patch_mask"])
    z_diff = float(
        np.abs(np.asarray(j_enc["z"])[mask] - t_enc["z"].numpy()[mask]).max()
    )
    p_diff = float(
        np.abs(
            np.asarray(j_out["patches"])[mask] - t_out["patches"].numpy()[mask]
        ).max()
    )

    result = {
        "model": args.model,
        "variant": variant,
        "weight_max_diff": w_diff,
        "latent_max_diff": z_diff,
        "output_max_diff": p_diff,
        "weights_pass": w_diff < args.weight_tol,
        "latents_pass": z_diff < args.output_tol,
        "outputs_pass": p_diff < args.output_tol,
    }
    print(json.dumps(result, indent=2))
    sys.exit(0 if all(v for k, v in result.items() if k.endswith("_pass")) else 1)


if __name__ == "__main__":
    main()
