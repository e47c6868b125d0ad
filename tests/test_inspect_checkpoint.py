"""scripts/inspect_checkpoint.py subprocess smoke tests (SURVEY §4.4 analog)."""

import json
import os
import subprocess
import sys

import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.models import AEConfig, init_params
from vitok_tpu.utils.params_io import save_safetensors_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_VARIANT = "w256_d2_h4-w256_d4_h4/1x16x16"


def _run(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "inspect_checkpoint.py"),
         *args],
        capture_output=True, text=True, env=env, cwd=REPO,
    )


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg = AEConfig.from_variant(TINY_VARIANT)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    full = str(d / "full.safetensors")
    enc = str(d / "encoder.safetensors")
    save_safetensors_params(params, full)
    save_safetensors_params(params, enc, component="encoder")
    return full, enc


def test_keys_dump(artifacts):
    full, _ = artifacts
    r = _run("keys", full)
    assert r.returncode == 0, r.stderr
    assert "encoder_blocks.0.attn.qkv_proj.weight" in r.stdout
    assert r.stdout.strip().endswith("tensors")


def test_summary_counts(artifacts):
    full, _ = artifacts
    r = _run("summary", full)
    assert r.returncode == 0, r.stderr
    payload = json.loads(r.stdout)
    assert payload["total_params"] > 0
    assert "encoder_blocks" in payload["components"]
    assert "decoder_blocks" in payload["components"]


def test_diff_matching(artifacts):
    full, _ = artifacts
    r = _run("diff", full, "--variant", TINY_VARIANT)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK: shapes match" in r.stdout


def test_diff_encoder_half(artifacts):
    _, enc = artifacts
    # Against the full expectation the encoder half reports missing decoder
    # keys; scoped to --component encoder it's clean.
    r = _run("diff", enc, "--variant", TINY_VARIANT)
    assert r.returncode == 1
    assert "MISSING" in r.stdout
    r = _run("diff", enc, "--variant", TINY_VARIANT, "--component", "encoder")
    assert r.returncode == 0, r.stdout + r.stderr


def test_diff_wrong_variant(artifacts):
    full, _ = artifacts
    # Artifact decoder is DEEPER than this variant expects -> EXTRA keys.
    r = _run("diff", full, "--variant", "w256_d2_h4-w256_d2_h4/1x16x16")
    assert r.returncode == 1
    assert "EXTRA" in r.stdout
    # Wider variant -> SHAPE mismatches on every shared tensor.
    r = _run("diff", full, "--variant", "w512_d2_h4-w512_d4_h4/1x16x32")
    assert r.returncode == 1
    assert "SHAPE" in r.stdout
