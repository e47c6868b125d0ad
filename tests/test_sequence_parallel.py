"""Sequence-parallel (token-sharded) forward vs single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vitok_tpu.models import AEConfig, init_params
from vitok_tpu.models.ae import forward_apply
from vitok_tpu.ops.attention import _xla_attention, make_attention_mask
from vitok_tpu.parallel import create_mesh
from vitok_tpu.parallel.sequence import (
    SEQ_AXIS,
    halo_attention,
    sequence_parallel_forward,
    sequence_parallel_value_and_grad,
)
from tests.test_ae import TINY, make_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestHaloAttention:
    def test_matches_global_swa(self):
        """Sharded halo attention == global sliding-window attention."""
        from jax import shard_map

        mesh = create_mesh({SEQ_AXIS: 8})
        b, n, h, d = 2, 128, 2, 16
        sw = 8
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = [jax.random.normal(kk, (b, n, h, d)) for kk in ks]
        mask = jnp.ones((b, n), bool).at[0, 100:].set(False)

        ref = _xla_attention(q, k, v, make_attention_mask(mask, n, sw))
        ref = ref * mask[:, :, None, None]

        spec = P(None, SEQ_AXIS, None, None)
        f = shard_map(
            lambda q_, k_, v_, m_: halo_attention(q_, k_, v_, m_, sw),
            mesh=mesh,
            in_specs=(spec, spec, spec, P(None, SEQ_AXIS)),
            out_specs=spec,
            check_vma=False,
        )
        out = f(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_window_larger_than_shard_raises(self):
        from jax import shard_map

        mesh = create_mesh({SEQ_AXIS: 8})
        q = jnp.zeros((1, 64, 2, 16))  # 8 tokens/shard
        with pytest.raises(ValueError, match="sliding_window"):
            shard_map(
                lambda q_: halo_attention(q_, q_, q_, None, 16),
                mesh=mesh,
                in_specs=(P(None, SEQ_AXIS, None, None),),
                out_specs=P(None, SEQ_AXIS, None, None),
                check_vma=False,
            )(q)


class TestSequenceParallelForward:
    def test_matches_single_device(self):
        """Token-sharded full forward == single-device forward."""
        cfg = AEConfig(**TINY, sw=4)
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=2, n=64, grid=(8, 8))

        ref = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)

        mesh = create_mesh({SEQ_AXIS: 8})
        out = sequence_parallel_forward(
            params, batch, cfg, mesh, compute_dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(out["patches"]),
            np.asarray(ref["patches"]),
            atol=2e-4,
        )

    def test_requires_sw(self):
        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        mesh = create_mesh({SEQ_AXIS: 8})
        with pytest.raises(ValueError, match="sw"):
            sequence_parallel_forward(
                params, make_batch(b=1, n=64), cfg, mesh
            )

    def test_masked_batch(self):
        """Padding distributed onto the tail shards stays exact."""
        cfg = AEConfig(**TINY, sw=4)
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1, n=64, grid=(6, 6), valid=36)
        ref = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)
        mesh = create_mesh({SEQ_AXIS: 8})
        out = sequence_parallel_forward(
            params, batch, cfg, mesh, compute_dtype=jnp.float32
        )
        m = np.asarray(batch["patch_mask"])
        np.testing.assert_allclose(
            np.asarray(out["patches"])[m],
            np.asarray(ref["patches"])[m],
            atol=2e-4,
        )


class TestSequenceParallelBackward:
    """Training side of SP (round-3): grads token-shard exactly."""

    def _single_device_value_and_grad(self, params, batch, cfg, eps=1e-3):
        from vitok_tpu.losses import charbonnier_loss

        def loss_fn(p):
            out = forward_apply(p, batch, cfg, compute_dtype=jnp.float32)
            return charbonnier_loss(
                out["patches"], batch["patches"],
                batch.get("patch_mask"), eps=eps,
            )

        return jax.value_and_grad(loss_fn)(params)

    def test_grads_match_single_device(self):
        cfg = AEConfig(**TINY, sw=4)
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=2, n=64, grid=(8, 8))
        ref_loss, ref_g = self._single_device_value_and_grad(params, batch, cfg)

        mesh = create_mesh({SEQ_AXIS: 8})
        loss, g = sequence_parallel_value_and_grad(
            params, batch, cfg, mesh, compute_dtype=jnp.float32
        )
        np.testing.assert_allclose(
            float(loss), float(ref_loss), atol=1e-6, rtol=1e-6
        )
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(g),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-5,
                err_msg=str(pa),
            )

    def test_grads_match_with_padding(self):
        """Masked tail tokens (NaFlex padding) contribute zero gradient."""
        cfg = AEConfig(**TINY, sw=4)
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1, n=64, grid=(6, 6), valid=36)
        ref_loss, ref_g = self._single_device_value_and_grad(params, batch, cfg)
        mesh = create_mesh({SEQ_AXIS: 8})
        loss, g = sequence_parallel_value_and_grad(
            params, batch, cfg, mesh, compute_dtype=jnp.float32
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_g), jax.tree_util.tree_leaves(g)
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    def test_train_smoke_16k_tokens(self):
        """One SGD step at 16k tokens over 8 shards (2k tokens/shard)."""
        cfg = AEConfig(**{**TINY, "sw": 64})
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1, n=16384, grid=(128, 128))
        mesh = create_mesh({SEQ_AXIS: 8})
        loss, g = sequence_parallel_value_and_grad(
            params, batch, cfg, mesh
        )
        assert np.isfinite(float(loss))
        gn = float(
            jnp.sqrt(
                sum(jnp.sum(x.astype(jnp.float32) ** 2)
                    for x in jax.tree_util.tree_leaves(g))
            )
        )
        assert np.isfinite(gn) and gn > 0
        new_params = jax.tree_util.tree_map(
            lambda p, gg: p - 1e-3 * gg.astype(p.dtype), params, g
        )
        loss2, _ = sequence_parallel_value_and_grad(
            new_params, batch, cfg, mesh
        )
        assert np.isfinite(float(loss2))

    def test_requires_sw(self):
        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        mesh = create_mesh({SEQ_AXIS: 8})
        with pytest.raises(ValueError, match="sw"):
            sequence_parallel_value_and_grad(
                params, make_batch(b=1, n=64), cfg, mesh
            )


def test_encoder_only_config():
    """Encoder-only configs return sharded latents, not a tree mismatch."""
    cfg = AEConfig(**{**TINY, "decoder": False, "sw": 4})
    params = init_params(cfg, jax.random.key(0))
    batch = make_batch(b=2, n=64, grid=(8, 8))
    ref = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)
    mesh = create_mesh({SEQ_AXIS: 8})
    out = sequence_parallel_forward(
        params, batch, cfg, mesh, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out["z"]), np.asarray(ref["z"]), atol=2e-4
    )
