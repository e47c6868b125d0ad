"""Parity tests for the fused small-N attention megakernel.

The kernel (interpret mode on CPU) must match the exact unfused composition
``rms_norm + apply_rotary_emb(half) + dot_product_attention(xla)`` it
replaces in ``models/ae.py::_block_body``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.ops import fused_attention as fa
from vitok_tpu.ops.rope import compute_2d_freqs_cis


def make_inputs(b=2, n=64, heads=4, d=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    c = heads * d
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)), dtype)
    q_scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    k_scale = jnp.asarray(1.0 - 0.1 * rng.standard_normal(d), jnp.float32)
    idx = np.arange(n)
    cols = max(int(np.sqrt(n)), 1)
    row = jnp.asarray(np.tile((idx // cols)[None], (b, 1)), jnp.int32)
    col = jnp.asarray(np.tile((idx % cols)[None], (b, 1)), jnp.int32)
    cos, sin = compute_2d_freqs_cis(row, col, d)
    return qkv, q_scale, k_scale, cos, sin


def fused_interp(qkv, qs, ks, cos, sin, mask, heads, sw=None):
    return fa.fused_qkv_attention(
        qkv, qs, ks, cos, sin, mask,
        num_heads=heads, sliding_window=sw, interpret=True,
    )


class TestFusedAttentionParity:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_no_mask(self, dtype):
        qkv, qs, ks, cos, sin = make_inputs(dtype=dtype)
        got = fused_interp(qkv, qs, ks, cos, sin, None, heads=4)
        want = fa.unfused_qkv_attention(
            qkv, qs, ks, cos, sin, None, 4, None, attn_impl="xla"
        )
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=tol, rtol=tol,
        )

    def test_tail_mask(self):
        qkv, qs, ks, cos, sin = make_inputs(b=3, n=64)
        mask = jnp.asarray(
            np.arange(64)[None, :] < np.array([[64], [40], [9]]), bool
        )
        got = fused_interp(qkv, qs, ks, cos, sin, mask, heads=4)
        want = fa.unfused_qkv_attention(
            qkv, qs, ks, cos, sin, mask, 4, None, attn_impl="xla"
        )
        # Compare on valid tokens only (dead-query rows are padding).
        m = np.asarray(mask)[..., None]
        np.testing.assert_allclose(
            np.asarray(got) * m, np.asarray(want) * m, atol=1e-5, rtol=1e-5
        )

    def test_sliding_window(self):
        qkv, qs, ks, cos, sin = make_inputs(n=64)
        got = fused_interp(qkv, qs, ks, cos, sin, None, heads=4, sw=7)
        want = fa.unfused_qkv_attention(
            qkv, qs, ks, cos, sin, None, 4, 7, attn_impl="xla"
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_mask_plus_window(self):
        qkv, qs, ks, cos, sin = make_inputs(b=2, n=49, heads=4, d=28)
        mask = jnp.asarray(
            np.arange(49)[None, :] < np.array([[49], [20]]), bool
        )
        got = fused_interp(qkv, qs, ks, cos, sin, mask, heads=4, sw=5)
        want = fa.unfused_qkv_attention(
            qkv, qs, ks, cos, sin, mask, 4, 5, attn_impl="xla"
        )
        m = np.asarray(mask)[..., None]
        np.testing.assert_allclose(
            np.asarray(got) * m, np.asarray(want) * m, atol=1e-5, rtol=1e-5
        )

    def test_multiple_head_groups(self, monkeypatch):
        # Shrink the VMEM budget so the channel axis splits into >1 group,
        # exercising the lane-offset BlockSpec views of the q/k/v planes.
        qkv, qs, ks, cos, sin = make_inputs(b=2, n=32, heads=8, d=64)
        monkeypatch.setattr(fa, "_VMEM_BUDGET", 16 * 32 * 32)
        assert fa._pick_group_channels(8 * 64, 64, 32) < 8 * 64
        got = fused_interp(qkv, qs, ks, cos, sin, None, heads=8)
        want = fa.unfused_qkv_attention(
            qkv, qs, ks, cos, sin, None, 8, None, attn_impl="xla"
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_slab_path_d64(self, dtype):
        # d=64 routes through the two-head 128-lane slab (full-width VPU
        # norm+RoPE via segment/permutation matmuls) — must match the
        # unfused composition under mask + sliding window too.
        qkv, qs, ks, cos, sin = make_inputs(
            b=2, n=64, heads=4, d=64, dtype=dtype
        )
        mask = jnp.asarray(
            np.arange(64)[None, :] < np.array([[64], [37]]), bool
        )
        got = fused_interp(qkv, qs, ks, cos, sin, mask, heads=4, sw=9)
        want = fa.unfused_qkv_attention(
            qkv, qs, ks, cos, sin, mask, 4, 9, attn_impl="xla"
        )
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        m = np.asarray(mask)[..., None]
        np.testing.assert_allclose(
            np.asarray(got, np.float32) * m,
            np.asarray(want, np.float32) * m,
            atol=tol, rtol=tol,
        )

    def test_packed_variance_bf16_default_dot_emulation(self):
        """Emulate the TPU DEFAULT-precision hi/lo variance dots on CPU.

        On TPU the two segment-matrix dots in ``_norm_rope_packed`` run as
        single-pass bf16 MXU matmuls (DEFAULT precision); interpret-mode
        CPU tests evaluate them at exact f32, so the truncation the hi/lo
        split compensates for is otherwise never exercised. Here both dot
        operands are explicitly cast to bf16 and the packed output must
        still match the per-head oracle within bf16 tolerance.
        """
        d, heads, n = 64, 2, 64
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((n, heads * d)), jnp.bfloat16)
        scale = jnp.asarray(
            1.0 + 0.1 * rng.standard_normal(d), jnp.float32
        )[None, :]
        _, _, _, cos, sin = make_inputs(b=1, n=n, heads=heads, d=d)
        cos_b = jnp.asarray(cos[0], x.dtype)   # [n, d//2]
        sin_b = jnp.asarray(sin[0], x.dtype)
        scale_w, cos_ext, sin_sgn, s_mat = fa._pack_constants(
            d, scale, cos_b, sin_b, x.dtype
        )

        def bf16_default_dot(a, b):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        got = fa._norm_rope_packed(
            x, scale_w, cos_ext, sin_sgn, s_mat, d, _var_dot=bf16_default_dot
        )
        # Per-head oracle at exact precision.
        want = jnp.concatenate(
            [
                fa._norm_rope_half(
                    x[:, h * d:(h + 1) * d], scale, cos_b, sin_b
                )
                for h in range(heads)
            ],
            axis=-1,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )

    def test_head_dim_64_and_128_shapes(self):
        # The model head dims (350M: 64, 5B: 128) at a reduced token count.
        for heads, d in [(2, 64), (2, 128)]:
            qkv, qs, ks, cos, sin = make_inputs(b=1, n=16, heads=heads, d=d)
            got = fused_interp(qkv, qs, ks, cos, sin, None, heads=heads)
            want = fa.unfused_qkv_attention(
                qkv, qs, ks, cos, sin, None, heads, None, attn_impl="xla"
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
            )


class TestFusedVjp:
    def test_bwd_matches_unfused_vjp(self):
        """The custom-vjp backward must equal the unfused composition's VJP."""
        qkv, qs, ks, cos, sin = make_inputs(b=1, n=16, heads=2, d=16)
        g = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (1, 16, 2 * 16)
            ),
            jnp.float32,
        )
        res = (qkv, qs, ks, cos, sin, None)
        dqkv, dqs, dks, dcos, dsin, dmask = fa._fused_op_bwd(2, None, res, g)

        def f(qkv_, qs_, ks_, cos_, sin_):
            return fa.unfused_qkv_attention(
                qkv_, qs_, ks_, cos_, sin_, None, 2, None, attn_impl="xla"
            )

        _, vjp = jax.vjp(f, qkv, qs, ks, cos, sin)
        want = vjp(g)
        for got_i, want_i in zip((dqkv, dqs, dks, dcos, dsin), want):
            np.testing.assert_allclose(
                np.asarray(got_i), np.asarray(want_i), atol=1e-5, rtol=1e-5
            )
        assert dmask is None

    def test_routing_off_tpu(self):
        """auto on CPU routes to the unfused path (no pallas compile)."""
        qkv, qs, ks, cos, sin = make_inputs(b=1, n=16, heads=2, d=16)
        out = fa.fused_qkv_attention(
            qkv, qs, ks, cos, sin, None, num_heads=2
        )
        want = fa.unfused_qkv_attention(
            qkv, qs, ks, cos, sin, None, 2, None, attn_impl="xla"
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(want))


class TestPallasBwdKernel:
    """Interpret-mode parity of the Pallas backward kernel against the
    unfused composition's VJP (the same oracle the fallback path uses)."""

    def _check(self, b, n, heads, d, mask=None, sw=None, dtype=jnp.float32,
               tol=None, seed=0):
        qkv, qs, ks, cos, sin = make_inputs(
            b=b, n=n, heads=heads, d=d, seed=seed, dtype=dtype
        )
        g = jnp.asarray(
            np.random.default_rng(seed + 1).standard_normal(
                (b, n, heads * d)
            ),
            dtype,
        )
        if mask is not None:
            # The op zeroes dead-query cotangents before either backward
            # branch (see _fused_op_bwd) — mirror that contract here.
            g = g * mask.astype(g.dtype)[..., None]
        dqkv, dqs, dks = fa._fused_bwd(
            qkv, qs, ks, cos, sin, mask, g, heads, sw, interpret=True
        )

        def f(qkv_, qs_, ks_):
            return fa.unfused_qkv_attention(
                qkv_, qs_, ks_, cos, sin, mask, heads, sw, attn_impl="xla"
            )

        _, vjp = jax.vjp(f, qkv, qs, ks)
        want_dqkv, want_dqs, want_dks = vjp(g)
        tol = tol or (1e-4 if dtype == jnp.float32 else 5e-2)
        np.testing.assert_allclose(
            np.asarray(dqkv, np.float32), np.asarray(want_dqkv, np.float32),
            atol=tol, rtol=tol,
        )
        np.testing.assert_allclose(
            np.asarray(dqs), np.asarray(want_dqs), atol=tol, rtol=tol
        )
        np.testing.assert_allclose(
            np.asarray(dks), np.asarray(want_dks), atol=tol, rtol=tol
        )

    def test_no_mask_f32(self):
        self._check(b=2, n=64, heads=4, d=32)

    def test_no_mask_bf16(self):
        self._check(b=2, n=64, heads=4, d=32, dtype=jnp.bfloat16)

    def test_tail_mask(self):
        mask = jnp.asarray(
            np.arange(64)[None, :] < np.array([[64], [40], [9]]), bool
        )
        self._check(b=3, n=64, heads=4, d=32, mask=mask)

    def test_sliding_window(self):
        self._check(b=2, n=64, heads=4, d=32, sw=7)

    def test_mask_plus_window(self):
        mask = jnp.asarray(
            np.arange(48)[None, :] < np.array([[48], [20]]), bool
        )
        self._check(b=2, n=48, heads=4, d=32, mask=mask, sw=5)

    def test_model_head_dims(self):
        # 350M: d=64; 5B: d=128.
        self._check(b=1, n=32, heads=2, d=64)
        self._check(b=1, n=32, heads=2, d=128)

    def test_multiple_head_groups(self, monkeypatch):
        monkeypatch.setattr(fa, "_VMEM_BUDGET", 100_000)
        cg = fa._pick_group_channels(
            8 * 64, 64, 32, lane_align=False, estimate=fa._vmem_estimate_bwd
        )
        assert 0 < cg < 8 * 64
        self._check(b=2, n=32, heads=8, d=64)


class TestRoutingGates:
    """Pin the megakernel routing contract (`can_fuse` / `can_fuse_bwd`).

    The backend check is monkeypatched to True so the SHAPE gates are
    testable on CPU; a regression here silently de-routes (perf loss) or
    mis-routes (remote-compile crash at d=128-packed — CLAUDE.md) the
    inference path, which no numerics test would catch.
    """

    def _tpu(self, monkeypatch):
        monkeypatch.setattr(fa, "_backend_is_tpu", lambda: True)

    def test_shape_gates(self, monkeypatch):
        self._tpu(monkeypatch)
        # The north-star configs route to the kernel.
        assert fa.can_fuse(256, 1024, 16)          # 350M @256p (d=64)
        assert fa.can_fuse(1024, 1024, 16)         # 350M @512p
        assert fa.can_fuse(256, 3072, 24)          # 5B @256p (d=128)
        assert fa.can_fuse(1024, 3072, 24)         # 5B @512p
        # Above the token cap -> flash/XLA path.
        assert not fa.can_fuse(fa.MAX_FUSED_TOKENS + 8, 1024, 16)
        # Ragged rows and non-multiple-of-64 head dims stay unfused.
        assert not fa.can_fuse(252, 1024, 16)      # n % 8
        assert not fa.can_fuse(256, 96 * 16, 16)   # d = 96
        assert not fa.can_fuse(256, 1024, 7)       # c % heads

    def test_bwd_gate_is_stricter_never_looser(self, monkeypatch):
        self._tpu(monkeypatch)
        for n, c, h in [
            (256, 1024, 16), (1024, 1024, 16), (256, 3072, 24),
            (1024, 3072, 24), (252, 1024, 16), (256, 96 * 16, 16),
            (2048, 1024, 16),
        ]:
            if fa.can_fuse_bwd(n, c, h):
                assert fa.can_fuse(n, c, h), (n, c, h)

    def test_off_tpu_gate_closed(self):
        assert not fa.can_fuse(256, 1024, 16)
        assert not fa.can_fuse_bwd(256, 1024, 16)
        assert not fa.can_fuse_q8(256, 1024, 16)

    def test_q8_gate_default_off(self, monkeypatch):
        # Measured slower in situ (see fused_attention._ENABLE_Q8): the
        # gate must stay closed unless explicitly opted in, even on TPU.
        self._tpu(monkeypatch)
        assert not fa.can_fuse_q8(256, 3072, 24)

    def test_q8_gate_shapes(self, monkeypatch):
        self._tpu(monkeypatch)
        monkeypatch.setattr(fa, "_ENABLE_Q8", True)
        # The 256-token rows host the [N, C] accumulator comfortably.
        assert fa.can_fuse_q8(256, 1024, 16)   # 350M @256p
        assert fa.can_fuse_q8(256, 3072, 24)   # 5B @256p
        # Never looser than the plain forward gate.
        for n, c, h in [
            (256, 1024, 16), (1024, 1024, 16), (256, 3072, 24),
            (1024, 3072, 24), (252, 1024, 16), (256, 96 * 16, 16),
        ]:
            if fa.can_fuse_q8(n, c, h):
                assert fa.can_fuse(n, c, h), (n, c, h)


class TestQuantEpilogue:
    """The int8-epilogue forward must match
    ``quantize_activation(fused_qkv_attention(...))`` — same op recipe, so
    scales agree to float rounding and int8 codes to at most one step
    (the two programs compile separately; XLA may fuse the shared forward
    math differently, moving values near rounding boundaries by 1 ULP)."""

    def _check(self, b, n, heads, d, mask=None, sw=None, dtype=jnp.float32,
               seed=0):
        from vitok_tpu.ops.quant import quantize_activation

        qkv, qs, ks, cos, sin = make_inputs(
            b=b, n=n, heads=heads, d=d, seed=seed, dtype=dtype
        )
        oq, oscale = fa.fused_qkv_attention_q8(
            qkv, qs, ks, cos, sin, mask,
            num_heads=heads, sliding_window=sw, interpret=True,
        )
        ref = fused_interp(qkv, qs, ks, cos, sin, mask, heads, sw)
        want_q, want_s = quantize_activation(ref)
        assert oq.dtype == jnp.int8 and oscale.shape == (b, n, 1)
        np.testing.assert_allclose(
            np.asarray(oscale), np.asarray(want_s), rtol=1e-6
        )
        dq = np.abs(
            np.asarray(oq, np.int32) - np.asarray(want_q, np.int32)
        )
        assert dq.max() <= 1
        assert (dq > 0).mean() < 0.01

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_no_mask(self, dtype):
        self._check(b=2, n=64, heads=4, d=32, dtype=dtype)

    def test_tail_mask(self):
        mask = jnp.asarray(
            np.arange(64)[None, :] < np.array([[64], [40]]), bool
        )
        self._check(b=2, n=64, heads=4, d=32, mask=mask)

    def test_slab_path_d64_with_window(self):
        mask = jnp.asarray(
            np.arange(64)[None, :] < np.array([[64], [37]]), bool
        )
        self._check(b=2, n=64, heads=4, d=64, mask=mask, sw=9,
                    dtype=jnp.bfloat16)

    def test_multiple_head_groups(self, monkeypatch):
        # Force >1 head group so the scratch accumulation + last-group
        # quantize actually crosses grid cells.
        monkeypatch.setattr(fa, "_VMEM_BUDGET", 2 * 1024 * 1024)
        c, d, n = 8 * 64, 64, 32
        assert 0 < fa._pick_group_channels_q8(c, d, n, lane_align=False) < c
        self._check(b=2, n=n, heads=8, d=d)


class TestModelQ8Routing:
    """Execute the ae.py int8 out-projection epilogue branch end-to-end.

    ``_block_body`` routes inference int8 attention through
    ``fused_qkv_attention_q8`` + ``int8_matmul_prequant`` when
    ``can_fuse_q8`` opens (TPU only). Off-TPU the branch is dead code, so
    force it open here (interpret-mode kernels) and check the full model
    forward against the same model with the branch closed — the fused
    attention + XLA ``quantize_activation`` chain it replaces.
    """

    def _cfg_params_batch(self):
        from vitok_tpu.models import AEConfig, init_params
        from vitok_tpu.ops.quant import quantize_block_params
        from tests.test_ae import make_batch

        # d=64, c=256 -> lane-aligned q8 group cg=128 < c (two groups,
        # packed two-heads-per-slab path) — the gate shape class the 350M
        # family hits on TPU.
        cfg = AEConfig(
            encoder_width=256, decoder_width=256,
            encoder_depth=2, decoder_depth=2,
            encoder_heads=4, decoder_heads=4,
            channels_per_token=8, pixels_per_token=768,
            attn_impl="auto",
            layer_scale_init=1.0,  # O(1) gamma: attenuation-free comparison
        )
        params = quantize_block_params(
            init_params(cfg, jax.random.key(0), dtype=jnp.float32)
        )
        batch = make_batch(b=2, n=64, grid=(8, 8), valid=40)
        return cfg, params, batch

    def test_int8_forward_matches_quant_chain(self, monkeypatch):
        import functools
        from vitok_tpu.models.ae import forward_apply

        cfg, params, batch = self._cfg_params_batch()
        assert fa._pick_group_channels_q8(256, 64, 64) == 128

        monkeypatch.setattr(fa, "_backend_is_tpu", lambda: True)
        monkeypatch.setattr(fa, "_ENABLE_Q8", True)
        monkeypatch.setattr(
            fa, "fused_qkv_attention_q8",
            functools.partial(fa.fused_qkv_attention_q8, interpret=True),
        )
        monkeypatch.setattr(
            fa, "fused_qkv_attention",
            functools.partial(fa.fused_qkv_attention, interpret=True),
        )

        got = forward_apply(params, batch, cfg)["patches"]

        # Same model, q8 epilogue closed: fused attention kernel + the XLA
        # quantize chain. Differences are confined to int8 codes moving by
        # <=1 step at rounding boundaries (separate compilations).
        monkeypatch.setattr(fa, "can_fuse_q8", lambda *a: False)
        want = forward_apply(params, batch, cfg)["patches"]

        got32 = np.asarray(got, np.float32)
        want32 = np.asarray(want, np.float32)
        scale = np.abs(want32).max()
        assert np.abs(got32 - want32).max() <= 0.02 * scale

        # And against the fully unfused int8 path (no megakernel at all) —
        # on VALID tokens only: dead padding queries produce arbitrary
        # (never-consumed) values that differ between the kernel's key-side
        # mask and the unfused two-sided mask.
        monkeypatch.setattr(fa, "can_fuse", lambda *a: False)
        unfused = np.asarray(
            forward_apply(params, batch, cfg)["patches"], np.float32
        )
        valid = np.asarray(batch["patch_mask"], bool)
        assert np.abs(got32 - unfused)[valid].max() <= 0.05 * scale
