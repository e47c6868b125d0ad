"""Pipelined training, end to end: step builder + train_vae.py --mesh pipe=K.

Round-3 verdict asked for pipeline-parallel training to be reachable from a
CLI (the library-level ``pipeline_parallel_value_and_grad`` was already
grads-verified in tests/test_pipeline.py). These tests cover the full
trainer: DP encoder chained through ``dz``, stage-local optimizer updates on
pipe-sharded block grads, one hoisted jit (no per-step retrace), EMA,
checkpoint resume, and the CLI guard rails.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.models import AEConfig, init_params
from vitok_tpu.parallel import (
    PIPE_AXIS,
    create_mesh,
    make_pipeline_train_step,
    pipeline_param_specs,
    place_on_mesh,
    shard_batch,
    shard_params,
)
from vitok_tpu.train_lib import (
    create_optimizer,
    create_schedule,
    create_train_state,
)
from tests.test_ae import TINY, make_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


class TestPipelineTrainStep:
    def _setup(self, stages=4, **cfg_over):
        cfg = AEConfig(**{**TINY, "decoder_depth": stages, **cfg_over})
        mesh = create_mesh(
            {PIPE_AXIS: stages}, devices=jax.devices()[:stages]
        )
        params = shard_params(
            init_params(cfg, jax.random.key(0)), mesh,
            spec_fn=pipeline_param_specs(mesh),
        )
        tx = create_optimizer(create_schedule("constant", 1e-3, 100, 0.0))
        # place_on_mesh replicates the scalar leaves (step, schedule count)
        # onto the mesh so the first step's output shardings match its
        # input's — without it the second call pays one extra compile.
        state = place_on_mesh(create_train_state(params, tx, ema=True), mesh)
        return cfg, tx, state, mesh

    def test_loss_decreases(self):
        cfg, tx, state, mesh = self._setup()
        step = make_pipeline_train_step(cfg, tx, mesh, donate=False)
        batch = shard_batch(make_batch(b=8, n=16), mesh)
        rng = jax.random.key(1)
        state, m0 = step(state, batch, rng)
        for _ in range(4):
            state, m = step(state, batch, rng)
        assert float(m["loss/total"]) < float(m0["loss/total"])
        assert int(state.step) == 5
        assert np.isfinite(float(m["grad_norm"]))

    def test_matches_unsharded_adamw_step(self):
        """One pipelined step == one single-device Charbonnier step:
        encoder grads (chained through dz) AND pipe-sharded decoder grads
        both land on the same updated params."""
        import optax

        cfg, tx, state, mesh = self._setup()
        batch_host = make_batch(b=8, n=16)
        step = make_pipeline_train_step(
            cfg, tx, mesh, compute_dtype=jnp.float32, donate=False
        )
        new_state, metrics = step(
            state, shard_batch(batch_host, mesh), jax.random.key(1)
        )

        from vitok_tpu.losses import charbonnier_loss
        from vitok_tpu.models.ae import forward_apply

        def loss_fn(p):
            out = forward_apply(p, batch_host, cfg, compute_dtype=jnp.float32)
            return charbonnier_loss(
                out["patches"], batch_host["patches"],
                batch_host.get("patch_mask"),
            )

        ref_loss, g = jax.value_and_grad(loss_fn)(state.params)
        assert abs(float(metrics["loss/total"]) - float(ref_loss)) < 1e-5
        updates, _ = tx.update(g, state.opt_state, state.params)
        want = optax.apply_updates(state.params, updates)
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(want),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5
            )

    def test_opt_state_and_grads_stay_pipe_sharded(self):
        """Block params, their AdamW moments, and EMA stay sharded over
        pipe after a step — the stage-local optimizer property."""
        from jax.sharding import NamedSharding

        cfg, tx, state, mesh = self._setup()
        step = make_pipeline_train_step(cfg, tx, mesh, donate=False)
        state, _ = step(
            state, shard_batch(make_batch(b=8, n=16), mesh),
            jax.random.key(1),
        )

        def pipe_sharded(x):
            s = x.sharding
            return (
                isinstance(s, NamedSharding)
                and s.spec
                and s.spec[0] == PIPE_AXIS
            )

        qkv = state.params["decoder_blocks"]["attn"]["qkv"]["kernel"]
        assert pipe_sharded(qkv)
        assert pipe_sharded(
            state.ema_params["decoder_blocks"]["attn"]["qkv"]["kernel"]
        )
        # AdamW moments mirror the param tree: every opt-state leaf with the
        # decoder qkv kernel's (unique) shape is one of its moments.
        moments = [
            l
            for l in jax.tree_util.tree_leaves(state.opt_state)
            if getattr(l, "shape", None) == qkv.shape
        ]
        assert moments and all(pipe_sharded(m) for m in moments)

    def test_ema_tracks_params(self):
        cfg, tx, state, mesh = self._setup()
        step = make_pipeline_train_step(
            cfg, tx, mesh, ema_decay=0.5, donate=False
        )
        ema_before = np.asarray(
            jax.tree_util.tree_leaves(state.ema_params)[0]
        ).copy()
        state, _ = step(
            state, shard_batch(make_batch(b=8, n=16), mesh),
            jax.random.key(1),
        )
        ema_after = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
        assert not np.allclose(ema_before, ema_after)

    def test_no_retrace_across_steps(self):
        """The hoisted jit compiles once; later steps reuse the trace."""
        cfg, tx, state, mesh = self._setup()
        step = make_pipeline_train_step(cfg, tx, mesh, donate=False)
        batch = shard_batch(make_batch(b=8, n=16), mesh)
        state, _ = step(state, batch, jax.random.key(0))
        before = step._cache_size()
        for i in range(3):
            state, _ = step(state, batch, jax.random.key(i + 1))
        assert step._cache_size() == before == 1


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pipe_imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(d)


def _run_cli(image_folder, out_dir, *extra):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_vae.py"),
         "--data", image_folder,
         "--variant", "w64_d2_h2-w64_d8_h2/1x16x8",
         "--max-tokens", "16", "--patch", "16", "--bs", "8",
         "--mesh", "pipe=8",
         "--log-freq", "2", "--save-freq", "2", "--ssim-weight", "0",
         "--output-dir", out_dir, *extra],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )


def test_cli_end_to_end_and_resume(image_folder, tmp_path):
    out_dir = str(tmp_path / "run")
    r = _run_cli(image_folder, out_dir, "--steps", "4")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "step 4:" in r.stdout
    line = [l for l in r.stdout.splitlines() if l.startswith("step 4:")][0]
    stats = json.loads(line.split("step 4: ", 1)[1])
    assert np.isfinite(stats["loss/total"])
    assert os.path.exists(os.path.join(out_dir, "last"))
    assert os.path.exists(os.path.join(out_dir, "safetensors"))

    r2 = _run_cli(image_folder, out_dir, "--steps", "6", "--resume")
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "resumed at step 4" in r2.stdout
    assert "step 6:" in r2.stdout


def test_cli_rejects_non_data_mesh_with_pipe(image_folder, tmp_path):
    """pipe composes with data only (round 5); fsdp/model extras still
    error loudly."""
    r = _run_cli(
        image_folder, str(tmp_path / "bad"), "--steps", "2",
        "--mesh", "fsdp=2,pipe=4", "--variant", "w64_d2_h2-w64_d4_h2/1x16x8",
    )
    assert r.returncode != 0
    assert "composes with data=D only" in (r.stdout + r.stderr)


def test_cli_grad_accum_with_pipe(image_folder, tmp_path):
    """--grad-accum now scans chunks through the GPipe schedule (round 5:
    the r4 exclusion is lifted; equality vs single-device is covered in
    test_pipeline.py::TestComposedPipelineTraining)."""
    out_dir = str(tmp_path / "ga_run")
    # pipe=8 (all devices); bs 16 / accum 2 -> 8-image chunks, m=8, mb=1.
    r = _run_cli(
        image_folder, out_dir, "--steps", "2", "--bs", "16",
        "--grad-accum", "2", "--log-freq", "2",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("step 2:")][0]
    stats = json.loads(line.split("step 2: ", 1)[1])
    assert np.isfinite(stats["loss/total"])


def test_cli_data_pipe_full_loss(image_folder, tmp_path):
    """Composed data=2,pipe=4 mesh with the full Charbonnier+SSIM loss and
    grad accumulation — the round-5 composition, end to end through the CLI
    (later --mesh/--ssim-weight occurrences override _run_cli defaults)."""
    out_dir = str(tmp_path / "dp_run")
    r = _run_cli(
        image_folder, out_dir, "--steps", "2",
        "--mesh", "data=2,pipe=4",
        "--variant", "w64_d2_h2-w64_d8_h2/1x16x8",
        "--ssim-weight", "0.1", "--log-freq", "2",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("step 2:")][0]
    stats = json.loads(line.split("step 2: ", 1)[1])
    assert np.isfinite(stats["loss/total"])
    assert stats["loss/ssim"] > 0
    assert stats["loss/charbonnier"] > 0
