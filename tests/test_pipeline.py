"""Pipeline-parallel decode/training vs single-device numerics (CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.losses import charbonnier_loss
from vitok_tpu.models import AEConfig, init_params
from vitok_tpu.models.ae import decode_apply, encode_apply
from vitok_tpu.parallel import create_mesh
from vitok_tpu.parallel.pipeline import (
    PIPE_AXIS,
    pipeline_parallel_decode,
    pipeline_parallel_value_and_grad,
)
from tests.test_ae import TINY, make_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(depth=8, b=8):
    cfg = AEConfig(**{**TINY, "decoder_depth": depth})
    params = init_params(cfg, jax.random.key(0))
    batch = make_batch(b=b, n=16, grid=(4, 4))
    enc = encode_apply(params, batch, cfg, compute_dtype=jnp.float32)
    return cfg, params, enc


class TestPipelineDecode:
    @pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (8, 8)])
    def test_matches_single_device(self, stages, microbatches):
        cfg, params, enc = _setup(depth=8, b=8)
        ref = decode_apply(params, enc, cfg, compute_dtype=jnp.float32)

        mesh = create_mesh(
            {PIPE_AXIS: stages}, devices=jax.devices()[:stages]
        )
        out = pipeline_parallel_decode(
            params, enc, cfg, mesh,
            num_microbatches=microbatches, compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(out["patches"]),
            np.asarray(ref["patches"]),
            atol=2e-4,
        )

    def test_masked_batch(self):
        cfg = AEConfig(**{**TINY, "decoder_depth": 8})
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=4, n=32, grid=(4, 4), valid=16)
        enc = encode_apply(params, batch, cfg, compute_dtype=jnp.float32)
        ref = decode_apply(params, enc, cfg, compute_dtype=jnp.float32)
        mesh = create_mesh({PIPE_AXIS: 4}, devices=jax.devices()[:4])
        out = pipeline_parallel_decode(
            params, enc, cfg, mesh, num_microbatches=4,
            compute_dtype=jnp.float32,
        )
        m = np.asarray(batch["patch_mask"])
        np.testing.assert_allclose(
            np.asarray(out["patches"])[m],
            np.asarray(ref["patches"])[m],
            atol=2e-4,
        )

    def test_memory_scales_with_stages(self):
        """Per-chip activation (temp) memory must shrink ~1/S: inputs and
        outputs are stored sharded, only O(1) microbatch buffers rotate."""
        cfg, params, enc = _setup(depth=8, b=8)

        def temp_bytes(stages):
            mesh = create_mesh(
                {PIPE_AXIS: stages}, devices=jax.devices()[:stages]
            )
            f = jax.jit(
                lambda p, e: pipeline_parallel_decode(
                    p, e, cfg, mesh,
                    num_microbatches=8, compute_dtype=jnp.float32,
                )
            )
            ma = f.lower(params, enc).compile().memory_analysis()
            if ma is None:  # backend without memory stats
                pytest.skip("memory_analysis unavailable")
            return ma.temp_size_in_bytes

        t2, t8 = temp_bytes(2), temp_bytes(8)
        assert t8 < t2 / 2.5, (t2, t8)

class TestPipelineTraining:
    """Grads through the GPipe schedule == single-device value_and_grad."""

    def _reference_vjg(self, params, enc, batch, cfg):
        def loss_fn(blocks, embed, topix, z):
            p = dict(params)
            p["decoder_blocks"] = blocks
            p["decoder_embed"] = embed
            p["to_pixels"] = topix
            e = dict(enc)
            e["z"] = z
            out = decode_apply(p, e, cfg, compute_dtype=jnp.float32)
            return charbonnier_loss(
                out["patches"], batch["patches"], batch.get("patch_mask")
            )

        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            params["decoder_blocks"],
            params["decoder_embed"],
            params["to_pixels"],
            enc["z"],
        )

    @pytest.mark.parametrize("stages,microbatches,remat", [
        (4, 4, True), (2, 8, False), (4, 8, True),
    ])
    def test_grads_match_single_device(self, stages, microbatches, remat):
        cfg, params, enc = _setup(depth=8, b=8)
        batch = make_batch(b=8, n=16, grid=(4, 4))
        ref_loss, (ref_gb, ref_ge, ref_gt, ref_gz) = self._reference_vjg(
            params, enc, batch, cfg
        )

        mesh = create_mesh({PIPE_AXIS: stages}, devices=jax.devices()[:stages])
        loss, grads, dz = pipeline_parallel_value_and_grad(
            params, enc, batch["patches"], cfg, mesh,
            num_microbatches=microbatches, compute_dtype=jnp.float32,
            remat=remat,
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
        for got, want in [
            (grads["decoder_blocks"], ref_gb),
            (grads["decoder_embed"], ref_ge),
            (grads["to_pixels"], ref_gt),
        ]:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-4
                ),
                got, want,
            )
        np.testing.assert_allclose(
            np.asarray(dz), np.asarray(ref_gz), atol=2e-4
        )

    def test_masked_grads_match(self):
        cfg = AEConfig(**{**TINY, "decoder_depth": 8})
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=4, n=32, grid=(4, 4), valid=16)
        enc = encode_apply(params, batch, cfg, compute_dtype=jnp.float32)
        ref_loss, (ref_gb, _, _, _) = self._reference_vjg(
            params, enc, batch, cfg
        )
        mesh = create_mesh({PIPE_AXIS: 4}, devices=jax.devices()[:4])
        loss, grads, _ = pipeline_parallel_value_and_grad(
            params, enc, batch["patches"], cfg, mesh,
            num_microbatches=4, compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            grads["decoder_blocks"], ref_gb,
        )

    def test_block_grads_sharded_over_pipe(self):
        """Each stage keeps only its slice's grad — the pipe-training point."""
        cfg, params, enc = _setup(depth=8, b=8)
        batch = make_batch(b=8, n=16, grid=(4, 4))
        mesh = create_mesh({PIPE_AXIS: 4}, devices=jax.devices()[:4])
        _, grads, _ = pipeline_parallel_value_and_grad(
            params, enc, batch["patches"], cfg, mesh,
            num_microbatches=4, compute_dtype=jnp.float32,
        )
        leaf = grads["decoder_blocks"]["attn"]["qkv"]["kernel"]
        spec = leaf.sharding.spec
        assert spec[0] == PIPE_AXIS, spec

    def test_remat_shrinks_backward_memory(self):
        """remat=True must not store per-tick block internals."""
        cfg, params, enc = _setup(depth=8, b=8)
        batch = make_batch(b=8, n=16, grid=(4, 4))
        mesh = create_mesh({PIPE_AXIS: 4}, devices=jax.devices()[:4])

        def temp_bytes(remat):
            f = jax.jit(
                lambda p, e, t: pipeline_parallel_value_and_grad(
                    p, e, t, cfg, mesh,
                    num_microbatches=8, compute_dtype=jnp.float32,
                    remat=remat,
                )
            )
            ma = (
                f.lower(params, enc, batch["patches"])
                .compile()
                .memory_analysis()
            )
            if ma is None:
                pytest.skip("memory_analysis unavailable")
            return ma.temp_size_in_bytes

        assert temp_bytes(True) < temp_bytes(False), "remat should save memory"


class TestPipelineErrors:
    def test_indivisible_microbatches_raises(self):
        cfg, params, enc = _setup(depth=8, b=8)
        mesh = create_mesh({PIPE_AXIS: 4}, devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="round-robin"):
            pipeline_parallel_decode(params, enc, cfg, mesh, num_microbatches=2)

    def test_indivisible_depth_raises(self):
        cfg, params, enc = _setup(depth=8)
        mesh = create_mesh({PIPE_AXIS: 3}, devices=jax.devices()[:3])
        with pytest.raises(ValueError, match="divisible"):
            pipeline_parallel_decode(params, enc, cfg, mesh)

    def test_indivisible_batch_raises(self):
        cfg, params, enc = _setup(depth=8, b=6)
        mesh = create_mesh({PIPE_AXIS: 4}, devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_parallel_decode(params, enc, cfg, mesh)
