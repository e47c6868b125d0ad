"""scripts/train_dit.py end-to-end on tiny configs (CPU, 8-dev mesh).

The DiT flow-matching trainer (ghost reference capability) exercised
through its CLI: precomputed-latents path, image-folder + frozen-AE path,
checkpoint/resume, the --checkpoint remat flag, and the muon optimizer.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(data_dir, out_dir, *extra, timeout=900):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_dit.py"),
         "--data", data_dir, "--dit", "w64_d2_h2/16",
         "--num-classes", "4", "--bs", "8", "--max-tokens", "16",
         "--log-freq", "2", "--save-freq", "0", "--lr", "1e-3",
         "--output-dir", out_dir, *extra],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


@pytest.fixture(scope="module")
def latent_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("latents")
    rng = np.random.default_rng(0)
    for i in range(16):
        np.save(
            d / f"lat_{i:03d}.npy",
            {"z": rng.standard_normal((16, 32)).astype(np.float32),
             "label": int(i % 4)},
        )
    return str(d)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(1)
    for i in range(10):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), np.uint8)
        ).save(d / f"i{i}.png")
    return str(d)


def _last_log(stdout, step):
    line = [l for l in stdout.splitlines() if f'"step": {step}' in l][0]
    return json.loads(line)


def test_latents_path_and_resume(latent_dir, tmp_path):
    out = str(tmp_path / "run")
    r = _run(latent_dir, out, "--steps", "4", "--save-freq", "4")
    assert r.returncode == 0, r.stdout + r.stderr
    stats = _last_log(r.stdout, 4)
    assert np.isfinite(stats["loss"])
    assert os.path.exists(os.path.join(out, "last"))

    r2 = _run(latent_dir, out, "--steps", "6", "--resume")
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "resumed at step 4" in r2.stdout
    assert np.isfinite(_last_log(r2.stdout, 6)["loss"])


def test_image_folder_with_frozen_ae(image_dir, tmp_path):
    r = _run(
        image_dir, str(tmp_path / "run_img"), "--steps", "2",
        "--ae", "w64_d2_h2-w64_d2_h2/1x16x8", "--max-tokens", "16",
        "--patch", "16", "--checkpoint", "1",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert np.isfinite(_last_log(r.stdout, 2)["loss"])


def test_muon_optimizer(latent_dir, tmp_path):
    r = _run(
        latent_dir, str(tmp_path / "run_muon"), "--steps", "2",
        "--optimizer", "muon",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert np.isfinite(_last_log(r.stdout, 2)["loss"])


def test_image_folder_without_ae_errors(image_dir, tmp_path):
    r = _run(image_dir, str(tmp_path / "bad"), "--steps", "2")
    assert r.returncode != 0
    assert "no .npy latent files" in (r.stdout + r.stderr)
