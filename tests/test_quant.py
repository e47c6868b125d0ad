"""Int8 quantization tests: numerics, idempotence, SSIM quality gate.

Mirrors the reference's FP8/INT8 gates
(``tests/gpu/test_float8_inference.py``): quantized-vs-full SSIM >= 0.99 on
reconstructions, no NaNs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.losses import ssim
from vitok_tpu.models import AE, AEConfig, decode_variant, init_params
from vitok_tpu.models.ae import forward_apply
from vitok_tpu.ops.quant import int8_linear, quantize_block_params, quantize_weight
from tests.test_ae import TINY, make_batch


class TestQuantOps:
    def test_weight_roundtrip_accuracy(self):
        k = jax.random.normal(jax.random.key(0), (64, 32))
        qp = quantize_weight(k)
        assert qp["kernel_int8"].dtype == jnp.int8
        deq = qp["kernel_int8"].astype(jnp.float32) * qp["scale"]
        rel = np.abs(np.asarray(deq - k)).max() / np.abs(np.asarray(k)).max()
        assert rel < 0.01  # <= 1/127 relative

    def test_int8_linear_close_to_fp(self):
        rng = jax.random.key(1)
        x = jax.random.normal(rng, (4, 16, 64))
        k = jax.random.normal(jax.random.key(2), (64, 32)) * 0.05
        ref = x @ k
        got = int8_linear(x, quantize_weight(k))
        err = np.abs(np.asarray(got - ref)).max()
        scale = np.abs(np.asarray(ref)).max()
        assert err / scale < 0.03

    def test_quantize_idempotent(self):
        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        q1 = quantize_block_params(p)
        q2 = quantize_block_params(q1)
        k1 = q1["encoder_blocks"]["attn"]["qkv"]["kernel_int8"]
        k2 = q2["encoder_blocks"]["attn"]["qkv"]["kernel_int8"]
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    def test_device_quantize_matches_host(self):
        """Leaf-by-leaf device quantization == the host/offload path."""
        from vitok_tpu.ops.quant import quantize_block_params_device

        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(3))
        want = quantize_block_params(p, offload=False)
        got = quantize_block_params_device(
            init_params(cfg, jax.random.key(3))  # fresh copy: device path deletes
        )
        wq = want["decoder_blocks"]["ffn"]["fc1"]
        gq = got["decoder_blocks"]["ffn"]["fc1"]
        np.testing.assert_array_equal(
            np.asarray(wq["kernel_int8"]), np.asarray(gq["kernel_int8"])
        )
        np.testing.assert_allclose(
            np.asarray(wq["scale"]), np.asarray(gq["scale"]), rtol=1e-6
        )

    def test_non_block_params_untouched(self):
        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        q = quantize_block_params(p)
        assert "kernel" in q["patch_embed"]
        assert "kernel_int8" not in q["patch_embed"]


class TestFusedSiluQuant:
    def test_matches_unfused_chain(self):
        """Pallas kernel (interpret) ~= silu(g)*v -> quantize_activation.

        The pallas interpreter evaluates bf16 silu with slightly different
        rounding than plain XLA, so the comparison allows one quantization
        step; the end-to-end SSIM gate below covers real quality.
        """
        from vitok_tpu.ops.quant import fused_silu_quant, quantize_activation

        rng = np.random.default_rng(0)
        # F deliberately not a lane multiple (the 5B ffn is 8208).
        hid = jnp.asarray(
            rng.standard_normal((2, 64, 2 * 136)), jnp.bfloat16
        )
        q, s = fused_silu_quant(hid, interpret=True)
        mv, mg = jnp.split(hid, 2, axis=-1)
        # The kernel computes the gate in f32 (Mosaic mis-lowers bf16 silu
        # scalar broadcasts): compare against the f32-gate chain exactly...
        t32 = jax.nn.silu(mg.astype(jnp.float32)) * mv.astype(jnp.float32)
        want_q, want_s = quantize_activation(t32)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(want_q))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(want_s), rtol=1e-6
        )
        # ...and stay within one quantization step of the bf16-gate chain
        # the unfused CPU path runs.
        bq, bs = quantize_activation(jax.nn.silu(mg) * mv)
        diff = np.abs(np.asarray(q, np.int32) - np.asarray(bq, np.int32))
        assert diff.max() <= 2 and (diff > 1).mean() < 0.01
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(bs), rtol=2e-2
        )

    def test_rmsnorm_quant_matches_unfused(self):
        """Pallas rmsnorm+quant (interpret) vs the f32 reference chain."""
        from vitok_tpu.ops.quant import fused_rmsnorm_quant, quantize_activation

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 48, 136)), jnp.bfloat16)
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(136), jnp.float32)
        q, s = fused_rmsnorm_quant(x, g, interpret=True)
        # f32 norm (no bf16 round-trip) -> quantize: the kernel's math.
        x32 = np.asarray(x, np.float32)
        var = (x32 ** 2).mean(-1, keepdims=True)
        y = x32 / np.sqrt(var + 1e-6) * np.asarray(g)[None, None]
        want_q, want_s = quantize_activation(jnp.asarray(y))
        np.testing.assert_array_equal(np.asarray(q), np.asarray(want_q))
        np.testing.assert_allclose(np.asarray(s), np.asarray(want_s), rtol=1e-6)
        # Within one step of the bf16-round-trip chain the CPU path runs.
        from vitok_tpu.ops.norms import rms_norm

        bq, _ = quantize_activation(rms_norm(x, g))
        diff = np.abs(np.asarray(q, np.int32) - np.asarray(bq, np.int32))
        assert diff.max() <= 1

    def test_block_size_respects_vmem(self):
        from vitok_tpu.ops.quant import fused_silu_quant

        # Very wide ffn: the row-block must shrink, output stays correct.
        rng = np.random.default_rng(1)
        hid = jnp.asarray(rng.standard_normal((1, 32, 2 * 512)), jnp.float32)
        q, s = fused_silu_quant(hid, interpret=True)
        assert q.shape == (1, 32, 512) and s.shape == (1, 32, 1)


class TestQuantQuality:
    def test_ssim_gate(self):
        """Quantized reconstruction must stay within SSIM >= 0.99 of bf16."""
        model = AE(
            **decode_variant("w128_d2_h2-w128_d4_h2/1x16x16"), attn_impl="xla"
        )
        batch = make_batch(b=2, n=64, grid=(8, 8), seed=3)
        full = model(batch)

        model.quantize()
        quant = model(batch)

        assert not bool(jnp.isnan(quant["patches"]).any())
        # Compare decoded patch tensors as images via SSIM proxy
        from vitok_tpu.train_lib import unpatchify_dense_static

        img_f = unpatchify_dense_static(dict(full), 8, 8, 16)
        img_q = unpatchify_dense_static(dict(quant), 8, 8, 16)
        # Normalize to a common range for the gate
        lo = float(jnp.minimum(img_f.min(), img_q.min()))
        hi = float(jnp.maximum(img_f.max(), img_q.max()))
        rng_ = max(hi - lo, 1e-6)
        s = float(
            ssim(
                img_f.astype(jnp.float32), img_q.astype(jnp.float32),
                data_range=rng_,
            )
        )
        assert s >= 0.99, s

    def test_quantize_api_parity(self):
        model = AE(**TINY)
        out = model.quantize()
        assert out is model  # returns self like the reference
        model.quantize()  # idempotent
