"""scripts/tokenize_data.py end-to-end: images -> latent shards -> images."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("tok_imgs")
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate([(64, 64), (48, 80), (96, 64)]):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(d)


def run_cli(*cli):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tokenize_data.py"), *cli],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_encode_decode_roundtrip(image_folder, tmp_path):
    lat = str(tmp_path / "latents")
    rec = str(tmp_path / "recons")
    model = "Td4-Td4/1x16x8"

    stats = run_cli(
        "encode", "--model", model, "--data", image_folder,
        "--output", lat, "--random-weights",
        "--batch-size", "2", "--max-size", "96",
    )
    assert stats["n_images"] == 3
    shards = sorted(glob.glob(os.path.join(lat, "latents_*.npz")))
    assert len(shards) == stats["shards"] == 2
    with np.load(shards[0]) as f:
        assert f["z"].dtype == np.float16
        assert f["z"].shape[0] == 2 and f["z"].shape[2] == 8
        assert "patch_mask" in f.files and "orig_height" in f.files

    stats = run_cli(
        "decode", "--model", model, "--data", lat,
        "--output", rec, "--random-weights",
    )
    assert stats["n_images"] == 3
    pngs = sorted(glob.glob(os.path.join(rec, "img_*.png")))
    assert len(pngs) == 3
    from PIL import Image

    # Original sizes restored by the unpack crop (loader order may differ
    # from the folder listing, so compare as a multiset).
    got = sorted(Image.open(p).size for p in pngs)
    assert got == sorted([(64, 64), (80, 48), (64, 96)])
