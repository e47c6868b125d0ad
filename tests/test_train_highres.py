"""Token-sharded (sequence-parallel) finetune: step builder + CLI e2e.

The training side of SURVEY §5.7's high-res regime: the step must optimize
under a ``seq`` mesh (grads replicated out of the token-sharded backward),
interoperate with ``train_lib.TrainState`` checkpoints, and the
``scripts/train_highres.py`` CLI must run end-to-end (fresh + resume) on
the virtual CPU mesh.
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
from vitok_tpu.parallel import create_mesh
from vitok_tpu.parallel.sequence import (
    SEQ_AXIS,
    make_sp_train_step,
    place_batch_token_sharded,
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


class TestSPTrainStep:
    def _setup(self, **cfg_over):
        cfg = AEConfig(**{**TINY, "sw": 4, **cfg_over})
        params = init_params(cfg, jax.random.key(0))
        tx = create_optimizer(create_schedule("constant", 1e-3, 100, 0.0))
        state = create_train_state(params, tx, ema=True)
        mesh = create_mesh({SEQ_AXIS: 8})
        return cfg, tx, state, mesh

    def test_loss_decreases(self):
        cfg, tx, state, mesh = self._setup()
        step = make_sp_train_step(cfg, tx, mesh, donate=False)
        batch = place_batch_token_sharded(make_batch(b=2, n=64), mesh)
        rng = jax.random.key(1)
        state, m0 = step(state, batch, rng)
        for _ in range(4):
            state, m = step(state, batch, rng)
        assert float(m["loss/total"]) < float(m0["loss/total"])
        assert int(state.step) == 5
        assert np.isfinite(float(m["grad_norm"]))

    def test_ema_tracks_params(self):
        cfg, tx, state, mesh = self._setup()
        step = make_sp_train_step(cfg, tx, mesh, ema_decay=0.5, donate=False)
        batch = place_batch_token_sharded(make_batch(b=1, n=64), mesh)
        ema_before = jax.tree_util.tree_leaves(state.ema_params)[0].copy()
        state, _ = step(state, batch, jax.random.key(1))
        ema_after = jax.tree_util.tree_leaves(state.ema_params)[0]
        assert not np.allclose(np.asarray(ema_before), np.asarray(ema_after))

    def test_stochastic_depth_path(self):
        """drop_path > 0 threads the replicated rng through every shard."""
        cfg, tx, state, mesh = self._setup(drop_path_rate=0.5)
        step = make_sp_train_step(cfg, tx, mesh, stochastic=True, donate=False)
        batch = place_batch_token_sharded(make_batch(b=4, n=64), mesh)
        state, m = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(m["loss/total"]))

    def test_matches_unsharded_adamw_step(self):
        """One SP step == one single-device step on the same batch."""
        import optax

        cfg, tx, state, mesh = self._setup()
        batch_host = make_batch(b=2, n=64)
        step = make_sp_train_step(
            cfg, tx, mesh, compute_dtype=jnp.float32, donate=False
        )
        new_state, _ = step(
            state, place_batch_token_sharded(batch_host, mesh),
            jax.random.key(1),
        )

        from vitok_tpu.losses import charbonnier_loss
        from vitok_tpu.models.ae import forward_apply

        def loss_fn(p):
            out = forward_apply(p, batch_host, cfg, compute_dtype=jnp.float32)
            return charbonnier_loss(
                out["patches"], batch_host["patches"],
                batch_host.get("patch_mask"),
            )

        g = jax.grad(loss_fn)(state.params)
        updates, _ = tx.update(g, state.opt_state, state.params)
        want = optax.apply_updates(state.params, updates)
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(want),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("hires_imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 255, (96, 96, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(d)


def _run_cli(image_folder, out_dir, *extra):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_highres.py"),
         "--data", image_folder,
         "--variant", "w64_d2_h2-w64_d2_h2/1x16x8",
         "--res", "64", "--patch", "16", "--sw", "2",
         "--seq", "8", "--bs", "2",
         "--log-freq", "2", "--save-freq", "2",
         "--output-dir", out_dir, *extra],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )


def test_cli_end_to_end_and_resume(image_folder, tmp_path):
    out_dir = str(tmp_path / "run")
    r = _run_cli(image_folder, out_dir, "--steps", "4")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "step 4:" in r.stdout
    # Loss logged and finite.
    line = [l for l in r.stdout.splitlines() if l.startswith("step 4:")][0]
    stats = json.loads(line.split("step 4: ", 1)[1])
    assert np.isfinite(stats["loss/total"])
    assert os.path.exists(os.path.join(out_dir, "last"))
    assert os.path.exists(os.path.join(out_dir, "safetensors"))

    r2 = _run_cli(image_folder, out_dir, "--steps", "6", "--resume")
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "resumed at step 4" in r2.stdout
    assert "step 6:" in r2.stdout


def test_cli_rejects_bad_geometry(image_folder, tmp_path):
    r = _run_cli(
        image_folder, str(tmp_path / "bad"), "--steps", "2", "--sw", "99",
    )
    assert r.returncode != 0
    assert "exceeds tokens per shard" in (r.stdout + r.stderr)
