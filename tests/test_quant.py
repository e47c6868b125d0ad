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


class TestFusedFFN:
    """The fused fc1-GEMM + SwiGLU + requantize kernel and its padded
    weight layout."""

    def _inputs(self, m=32, c=256, f=136, seed=0):
        from vitok_tpu.ops.quant import (
            pad_fc1_kernel,
            quantize_activation,
            quantize_weight,
        )

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)
        hq, hs = quantize_activation(x)
        w = jnp.asarray(
            0.05 * rng.standard_normal((c, 2 * f)), jnp.bfloat16
        )
        fc1 = quantize_weight(pad_fc1_kernel(w))
        return hq, hs, fc1

    def test_matches_unfused_chain(self):
        """Interpret-mode kernel vs int8-GEMM -> f32 silu -> quantize.

        The kernel stages silu(g)*v in bf16 VMEM scratch before the exact
        per-token quantize, so int8 values may differ from the f32-staged
        oracle by one step and scales by ~2^-8 relative.
        """
        from vitok_tpu.ops.quant import fused_ffn_int8, quantize_activation

        hq, hs, fc1 = self._inputs()
        q, s = fused_ffn_int8(hq, hs, fc1, interpret=True)
        fp = fc1["kernel_int8"].shape[-1] // 2
        assert q.shape == (hq.shape[0], fp) and s.shape == (hq.shape[0], 1)

        acc = hq.astype(jnp.float32) @ fc1["kernel_int8"].astype(jnp.float32)
        hid = acc * hs * fc1["scale"][None]
        v, g = hid[:, :fp], hid[:, fp:]
        want_q, want_s = quantize_activation(jax.nn.silu(g) * v)
        diff = np.abs(np.asarray(q, np.int32) - np.asarray(want_q, np.int32))
        assert diff.max() <= 1, diff.max()
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(want_s), rtol=1e-2
        )
        # Pad columns must quantize to exactly zero.
        assert not np.asarray(q)[:, 136:].any()

    def test_row_tiling(self):
        """Multiple row tiles (grid dim 0 > 1) agree with one-shot rows."""
        from vitok_tpu.ops.quant import fused_ffn_int8

        hq, hs, fc1 = self._inputs(m=24, c=128, f=128, seed=3)
        q, s = fused_ffn_int8(hq, hs, fc1, interpret=True)  # mt=8, 3 tiles
        q1, s1 = fused_ffn_int8(hq[:8], hs[:8], fc1, interpret=True)
        np.testing.assert_array_equal(np.asarray(q[:8]), np.asarray(q1))
        np.testing.assert_allclose(np.asarray(s[:8]), np.asarray(s1))

    def test_padded_layout_is_transparent_to_unfused_path(self):
        """Padded fc1/fc2 int8 weights give bit-identical forward outputs
        through the generic (non-Pallas) int8 path."""
        from vitok_tpu.ops.quant import quantize_weight

        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
        padded = quantize_block_params(params)  # pads fc1/fc2
        # Reference: quantize WITHOUT padding (the old layout).
        import copy

        unpadded = copy.deepcopy(params)
        for grp in ("encoder_blocks", "decoder_blocks"):
            for name in ("qkv", "out"):
                unpadded[grp]["attn"][name] = quantize_weight(
                    unpadded[grp]["attn"][name]["kernel"]
                )
            for name in ("fc1", "fc2"):
                unpadded[grp]["ffn"][name] = quantize_weight(
                    unpadded[grp]["ffn"][name]["kernel"]
                )
        f = params["encoder_blocks"]["ffn"]["fc1"]["kernel"].shape[-1] // 2
        fp = padded["encoder_blocks"]["ffn"]["fc1"]["kernel_int8"].shape[-1] // 2
        assert fp == ((f + 127) // 128) * 128 and fp != f  # pad exercised

        batch = make_batch(2, 16)
        out_pad = forward_apply(padded, batch, cfg)
        out_ref = forward_apply(unpadded, batch, cfg)
        np.testing.assert_array_equal(
            np.asarray(out_pad["patches"], np.float32),
            np.asarray(out_ref["patches"], np.float32),
        )

    def test_fc2_pad_rows_are_zero(self):
        from vitok_tpu.ops.quant import pad_fc2_kernel

        k = jnp.ones((2, 136, 64), jnp.float32)
        kp = pad_fc2_kernel(k)
        assert kp.shape == (2, 256, 64)
        assert not np.asarray(kp)[:, 136:].any()

    def test_can_fuse_ffn_shape_gate(self):
        from vitok_tpu.ops.quant import can_fuse_ffn

        import unittest.mock as mock

        with mock.patch("jax.default_backend", return_value="tpu"):
            assert can_fuse_ffn(4096, 3072, 2 * 8320)
            assert not can_fuse_ffn(4095, 3072, 2 * 8320)  # rows not 8-mult
            assert not can_fuse_ffn(4096, 3072, 2 * 8208)  # unpadded ffn
            assert not can_fuse_ffn(4096, 3000, 2 * 8320)  # width not lane-aligned
        assert not can_fuse_ffn(4096, 3072, 2 * 8320)  # CPU backend


def _gate_ssim(out_a, out_b):
    """SSIM between two decode outputs on a dense 8x8 grid (common range)."""
    from vitok_tpu.train_lib import unpatchify_dense_static

    img_a = unpatchify_dense_static(dict(out_a), 8, 8, 16)
    img_b = unpatchify_dense_static(dict(out_b), 8, 8, 16)
    lo = float(jnp.minimum(img_a.min(), img_b.min()))
    hi = float(jnp.maximum(img_a.max(), img_b.max()))
    rng_ = max(hi - lo, 1e-6)
    return float(
        ssim(
            img_a.astype(jnp.float32), img_b.astype(jnp.float32),
            data_range=rng_,
        )
    )


class TestQuantQuality:
    # Gate-sensitive config: the reference LayerScale init (1e-4) attenuates
    # every quantized block 1e4x, so a gate at init weights is near-vacuous
    # (VERDICT r3: rel diff 1.2e-6 at gamma=1e-4 vs ~1e-2 at gamma=1).
    # All quality gates here run at gamma = O(1), the scale trained
    # checkpoints actually reach.
    GATE_VARIANT = dict(
        decode_variant("w128_d2_h2-w128_d4_h2/1x16x16"), attn_impl="xla",
        layer_scale_init=1.0,
    )

    def test_ssim_gate(self):
        """Quantized reconstruction must stay within SSIM >= 0.99 of bf16,
        measured on gate-sensitive (gamma=1) weights."""
        model = AE(**self.GATE_VARIANT)
        batch = make_batch(b=2, n=64, grid=(8, 8), seed=3)
        full = model(batch)

        model.quantize()
        quant = model(batch)

        assert not bool(jnp.isnan(quant["patches"]).any())
        s = _gate_ssim(full, quant)
        assert s >= 0.99, s
        # Non-vacuity: at gamma=1 the int8 path must actually differ from
        # the full path (at gamma=1e-4 this diff collapses to ~1e-6).
        assert s < 1.0 - 1e-9, "gate is vacuous: int8 output identical"

    def test_ssim_gate_negative_control(self):
        """Red-team leg: 4-bit-level weight noise MUST trip the gate.

        Proves the SSIM gate can fail — guards against the gate regressing
        into a tautology (e.g. by comparing at attenuating LayerScale init).
        """
        from vitok_tpu.ops.quant import degrade_block_weights

        model = AE(**self.GATE_VARIANT)
        batch = make_batch(b=2, n=64, grid=(8, 8), seed=3)
        full = model(batch)

        bad = AE(params=degrade_block_weights(model.params, bits=4),
                 **self.GATE_VARIANT)
        out_bad = bad(batch)
        s = _gate_ssim(full, out_bad)
        assert s < 0.99, f"gate failed to trip on 4-bit weights: SSIM {s}"

    def test_gate_sensitive_params_only_touches_gamma(self):
        from vitok_tpu.ops.quant import gate_sensitive_params

        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        g = gate_sensitive_params(p, seed=7)
        gamma = np.asarray(g["decoder_blocks"]["layer_scale"]["gamma"])
        assert (gamma >= 0.5).all() and (gamma <= 1.5).all()
        # every non-gamma leaf identical (shared, not copied)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p),
            jax.tree_util.tree_leaves_with_path(g),
        ):
            if "gamma" not in str(path):
                assert a is b, path

    def test_quantize_api_parity(self):
        model = AE(**TINY)
        out = model.quantize()
        assert out is model  # returns self like the reference
        model.quantize()  # idempotent
