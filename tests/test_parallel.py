"""Sharding + distributed tests on the 8-device virtual CPU mesh.

Verifies what the torch reference never could without hardware
(SURVEY.md §4.5): dp/fsdp/tp param layouts, sharded forward numerics vs
single-device, and a fully sharded train step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vitok_tpu.models import AEConfig, init_params
from vitok_tpu.models.ae import forward_apply
from vitok_tpu.parallel import (
    create_mesh,
    shard_batch,
    shard_params,
)
from tests.test_ae import TINY, make_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    def test_create_default(self):
        mesh = create_mesh()
        assert mesh.shape["data"] == 8

    def test_create_3d(self):
        mesh = create_mesh({"data": 2, "fsdp": 2, "model": 2})
        assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}

    def test_wildcard(self):
        mesh = create_mesh({"data": -1, "model": 2})
        assert mesh.shape["data"] == 4

    def test_bad_sizes(self):
        with pytest.raises(ValueError):
            create_mesh({"data": 3})


class TestShardedForward:
    @pytest.mark.parametrize(
        "axes",
        [
            {"data": 8},
            {"data": 2, "fsdp": 4},
            {"data": 2, "fsdp": 2, "model": 2},
            {"model": 8},
        ],
    )
    def test_matches_single_device(self, axes):
        """Sharded forward must be numerically identical to unsharded."""
        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=8, n=32, grid=(4, 4), valid=16)

        ref = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)

        mesh = create_mesh(axes)
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh)

        fwd = jax.jit(
            lambda p, b: forward_apply(p, b, cfg, compute_dtype=jnp.float32)
        )
        out = fwd(sp, sb)
        np.testing.assert_allclose(
            np.asarray(out["patches"]),
            np.asarray(ref["patches"]),
            atol=2e-4,
        )

    def test_param_layouts(self):
        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        mesh = create_mesh({"data": 2, "fsdp": 2, "model": 2})
        sp = shard_params(params, mesh)
        qkv = sp["encoder_blocks"]["attn"]["qkv"]["kernel"]
        assert qkv.sharding.spec == P(None, "fsdp", "model")
        out_k = sp["encoder_blocks"]["attn"]["out"]["kernel"]
        assert out_k.sharding.spec == P(None, "model", "fsdp")
        norm = sp["encoder_blocks"]["norm1"]["scale"]
        assert norm.sharding.spec == P()


class TestShardedTrainStep:
    def test_train_step_runs_and_reduces(self):
        from vitok_tpu.train_lib import (
            LossConfig,
            create_optimizer,
            create_schedule,
            create_train_state,
            make_train_step,
        )

        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        mesh = create_mesh({"data": 2, "fsdp": 2, "model": 2})
        params = shard_params(params, mesh)

        tx = create_optimizer(
            create_schedule("cosine", 1e-3, 100, warmup_frac=0.0)
        )
        state = create_train_state(params, tx)
        batch = shard_batch(
            make_batch(b=8, n=16, grid=(4, 4)), mesh
        )
        step = make_train_step(
            cfg, tx,
            LossConfig(ssim_grid=(4, 4)),
            compute_dtype=jnp.float32,
            donate=False,
        )
        state2, metrics = step(state, batch, jax.random.key(1))
        assert int(state2.step) == 1
        assert np.isfinite(float(metrics["loss/total"]))
        assert np.isfinite(float(metrics["loss/ssim"]))
        assert float(metrics["grad_norm"]) > 0
        # Params actually changed.
        delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
        )
        assert max(jax.tree_util.tree_leaves(delta)) > 0

    def test_loss_decreases(self):
        from vitok_tpu.train_lib import (
            LossConfig,
            create_optimizer,
            create_schedule,
            create_train_state,
            make_train_step,
        )

        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        mesh = create_mesh({"data": 8})
        params = shard_params(params, mesh)
        tx = create_optimizer(
            create_schedule("constant", 3e-4, 100, warmup_frac=0.0)
        )
        state = create_train_state(params, tx, ema=False)
        batch = shard_batch(make_batch(b=8, n=16, grid=(4, 4)), mesh)
        step = make_train_step(
            cfg, tx, LossConfig(), compute_dtype=jnp.float32, donate=False
        )
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.key(0))
            losses.append(float(metrics["loss/total"]))
        assert losses[-1] < losses[0], losses


class TestShardedGradAccum:
    def test_sharded_accum_matches_single_device(self):
        # grad_accum reshapes the dp-sharded batch axis to
        # (accum, micro); the resulting params must still equal the
        # unsharded full-batch step.
        from vitok_tpu.train_lib import (
            LossConfig,
            create_optimizer,
            create_schedule,
            create_train_state,
            make_train_step,
        )

        cfg = AEConfig(**TINY)
        batch = make_batch(b=16, n=16, grid=(4, 4))

        def run(sharded: bool, grad_accum: int):
            params = init_params(cfg, jax.random.key(0))
            tx = create_optimizer(
                create_schedule("constant", 3e-4, 100, warmup_frac=0.0)
            )
            b = dict(batch)
            if sharded:
                mesh = create_mesh({"data": 8})
                params = shard_params(params, mesh)
                b = shard_batch(b, mesh)
            state = create_train_state(params, tx, ema=False)
            step = make_train_step(
                cfg, tx, LossConfig(), compute_dtype=jnp.float32,
                donate=False, grad_accum=grad_accum,
            )
            state, metrics = step(state, b, jax.random.key(1))
            return state.params, float(metrics["loss/total"])

        ref_params, ref_loss = run(sharded=False, grad_accum=1)
        acc_params, acc_loss = run(sharded=True, grad_accum=2)
        assert acc_loss == pytest.approx(ref_loss, rel=1e-5)
        err = max(
            float(jnp.abs(a - b).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(ref_params),
                jax.tree_util.tree_leaves(acc_params),
            )
        )
        # fp32 microbatch averaging reorders the gradient summation, so
        # allow a few ulps of drift after the optimizer update.
        assert err < 1e-5, f"sharded grad-accum params diverge: {err}"


class TestDistributedMetrics:
    def test_psum_mean_matches_global(self):
        """Distributed mean/cov reduction pattern (metrics parity check)."""
        from jax import shard_map

        mesh = create_mesh({"data": 8})
        x = jax.random.normal(jax.random.key(0), (64, 16))

        def local_stats(xs):
            n = jnp.float32(xs.shape[0])
            s = jnp.sum(xs, axis=0)
            n_g = jax.lax.psum(n, "data")
            s_g = jax.lax.psum(s, "data")
            return s_g / n_g

        f = shard_map(
            local_stats,
            mesh=mesh,
            in_specs=P("data", None),
            out_specs=P(),
        )
        got = np.asarray(f(x))
        np.testing.assert_allclose(got, np.asarray(x.mean(0)), atol=1e-6)
