"""Checkpoint debug utilities: key dump, shape diff, summary.

The TPU analog of the reference's debug scripts (SURVEY.md §4.4 —
``tests/utils/debug_checkpoint.py`` key dump,
``tests/utils/test_weight_shapes.py`` ckpt-vs-model shape diff,
``tests/utils/analyze_safetensors.py`` artifact inspection). One CLI,
three modes, no Modal dependency:

    # flat key dump (names, shapes, dtypes) from safetensors or an Orbax dir
    python scripts/inspect_checkpoint.py keys encoder.safetensors

    # per-component parameter/byte summary
    python scripts/inspect_checkpoint.py summary ckpt_dir/

    # shape diff vs what a model variant expects
    python scripts/inspect_checkpoint.py diff encoder.safetensors \
        --variant Ld4-Ld24/1x16x64

Recon grids from a checkpoint (the reference's ``test_recon_viz.py``) are
``scripts/eval_vae.py --save-visuals``.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def _load_flat(path: str):
    """Load any supported artifact into a flat ``{name: ndarray}`` dict.

    Safetensors files load in the reference's flat torch layout; Orbax
    directories and ``.npz`` files load our pytree and are flattened to
    the same torch names via ``pytree_to_torch_state`` so diffs/dumps are
    layout-independent.
    """
    from vitok_tpu.utils.params_io import pytree_to_torch_state

    if os.path.isdir(path):
        from vitok_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(path)
        params = state.get("params", state) if isinstance(state, dict) else state
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
        return pytree_to_torch_state(params)
    if path.endswith(".npz"):
        return dict(np.load(path))
    from safetensors.numpy import load_file

    return load_file(path)


def _expected_flat(variant: str):
    """Flat torch-layout shapes a given model variant expects."""
    import jax
    import jax.numpy as jnp

    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.utils.params_io import pytree_to_torch_state

    cfg = AEConfig.from_variant(variant)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    return pytree_to_torch_state(params)


def cmd_keys(args) -> int:
    flat = _load_flat(args.path)
    for name in sorted(flat):
        v = flat[name]
        print(f"{name:60s} {str(tuple(v.shape)):20s} {v.dtype}")
    print(f"-- {len(flat)} tensors")
    return 0


def cmd_summary(args) -> int:
    flat = _load_flat(args.path)
    groups = {}
    for name, v in flat.items():
        top = name.split(".")[0]
        n, b = groups.get(top, (0, 0))
        groups[top] = (n + int(np.prod(v.shape)), b + v.nbytes)
    rows = {
        top: {"params": n, "mbytes": round(b / 1e6, 2)}
        for top, (n, b) in sorted(groups.items())
    }
    total = sum(n for n, _ in groups.values())
    print(json.dumps({"total_params": total, "components": rows}, indent=2))
    return 0


_HALF_PREFIXES = {
    "encoder": ("patch_embed", "to_code", "encoder_blocks"),
    "decoder": ("decoder_embed", "to_pixels", "decoder_blocks"),
}


def cmd_diff(args) -> int:
    flat = _load_flat(args.path)
    want = _expected_flat(args.variant)
    if args.component in _HALF_PREFIXES:
        pref = _HALF_PREFIXES[args.component]
        want = {k: v for k, v in want.items() if k.startswith(pref)}
    ck, wk = set(flat), set(want)
    issues = 0
    for name in sorted(wk - ck):
        print(f"MISSING  {name:55s} want {tuple(want[name].shape)}")
        issues += 1
    for name in sorted(ck - wk):
        print(f"EXTRA    {name:55s} have {tuple(flat[name].shape)}")
        issues += 1
    for name in sorted(ck & wk):
        a, b = tuple(flat[name].shape), tuple(want[name].shape)
        if a != b:
            print(f"SHAPE    {name:55s} have {a} want {b}")
            issues += 1
    print(f"-- {issues} mismatches" if issues else "-- OK: shapes match")
    return 1 if issues else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="mode", required=True)
    for mode, fn in (("keys", cmd_keys), ("summary", cmd_summary),
                     ("diff", cmd_diff)):
        p = sub.add_parser(mode)
        p.add_argument("path", help="safetensors file, .npz, or Orbax dir")
        p.set_defaults(fn=fn)
        if mode == "diff":
            p.add_argument("--variant", required=True,
                           help="model variant string, e.g. Ld4-Ld24/1x16x64")
            p.add_argument("--component", default="full",
                           choices=("full", "encoder", "decoder"),
                           help="limit MISSING checks to one released half")
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
