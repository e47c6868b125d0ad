"""Dataset preparation: download/stage eval + training data locally.

Capability parity with reference ``scripts/modal/setup_data.py``
(Na-VAE/vitok-release), minus the Modal volume plumbing: stages COCO-val,
ImageNet-val, DIV8K and the named HF streaming sets into a local directory
tree the loaders consume directly. Network access required (gated — this
image is zero-egress; run on a connected host).

    python scripts/setup_data.py --dataset coco-val --out /data
"""

from __future__ import annotations

import argparse
import os
import sys

DATASETS = {
    # name -> (kind, source, notes)
    "coco-val": (
        "zip",
        "http://images.cocodataset.org/zips/val2017.zip",
        "5k COCO validation images (rFID eval set)",
    ),
    "imagenet-val": (
        "hf",
        "ILSVRC/imagenet-1k",
        "requires accepting the HF license; uses the validation split",
    ),
    "div8k": (
        "hf",
        "Iceclear/DIV8K_TrainingSet",
        "8K-resolution images (high-res eval tables)",
    ),
}


def stage_zip(url: str, out: str) -> None:
    import urllib.request
    import zipfile

    os.makedirs(out, exist_ok=True)
    zpath = os.path.join(out, os.path.basename(url))
    if not os.path.exists(zpath):
        print(f"downloading {url} -> {zpath}")
        urllib.request.urlretrieve(url, zpath)
    with zipfile.ZipFile(zpath) as zf:
        zf.extractall(out)
    print(f"extracted into {out}")


def stage_hf(repo: str, out: str, split: str = "validation") -> None:
    try:
        from datasets import load_dataset
    except ImportError:
        sys.exit("needs the `datasets` package (run on a connected host)")
    os.makedirs(out, exist_ok=True)
    ds = load_dataset(repo, split=split, streaming=True)
    n = 0
    for i, ex in enumerate(ds):
        img = ex.get("image")
        if img is None:
            continue
        img.convert("RGB").save(os.path.join(out, f"{i:08d}.jpg"), quality=95)
        n += 1
    print(f"wrote {n} images to {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, choices=sorted(DATASETS))
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="validation")
    args = ap.parse_args()
    kind, source, notes = DATASETS[args.dataset]
    print(f"{args.dataset}: {notes}")
    target = os.path.join(args.out, args.dataset)
    if kind == "zip":
        stage_zip(source, target)
    else:
        stage_hf(source, target, args.split)


if __name__ == "__main__":
    main()
