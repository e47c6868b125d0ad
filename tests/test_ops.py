"""Unit tests for core ops: RoPE, norms, SwiGLU, attention.

Each op is checked for shape/dtype invariants and — where the torch reference
is importable — for numerical parity against the reference modules
(``vitok/models/modules/*`` used as an oracle, never copied).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitok_tpu.ops import (
    apply_rotary_emb,
    compute_2d_freqs_cis,
    compute_inv_freq,
    dot_product_attention,
    layer_norm,
    make_attention_mask,
    rms_norm,
    round_hidden_dim,
    swiglu,
)

from tests.reference_loader import load_reference_ae

try:
    import torch

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


class TestRoPE:
    def test_inv_freq_values(self):
        f = compute_inv_freq(8, theta=10000.0)
        expected = 1.0 / (10000.0 ** (np.arange(0, 8, 2) / 8))
        np.testing.assert_allclose(np.asarray(f), expected, rtol=1e-5)

    def test_inv_freq_odd_dim_raises(self):
        with pytest.raises(ValueError):
            compute_inv_freq(7)

    def test_2d_freqs_shape(self):
        row = jnp.zeros((2, 16))
        col = jnp.zeros((2, 16))
        cos, sin = compute_2d_freqs_cis(row, col, dim=64)
        assert cos.shape == (2, 16, 32)
        assert cos.dtype == jnp.float32

    def test_2d_requires_dim_mult_4(self):
        with pytest.raises(ValueError):
            compute_2d_freqs_cis(jnp.zeros((1, 4)), jnp.zeros((1, 4)), dim=6)

    def test_rotation_preserves_norm(self):
        rng = jax.random.key(0)
        q = jax.random.normal(rng, (2, 16, 4, 64))
        k = jax.random.normal(jax.random.key(1), (2, 16, 4, 64))
        row = jnp.tile(jnp.arange(16)[None], (2, 1)).astype(jnp.float32)
        cos, sin = compute_2d_freqs_cis(row, row, dim=64)
        q2, k2 = apply_rotary_emb(q, k, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q2), axis=-1),
            np.linalg.norm(np.asarray(q), axis=-1),
            rtol=1e-5,
        )

    def test_zero_position_is_identity(self):
        q = jax.random.normal(jax.random.key(0), (1, 4, 2, 32))
        zeros = jnp.zeros((1, 4))
        cos, sin = compute_2d_freqs_cis(zeros, zeros, dim=32)
        q2, _ = apply_rotary_emb(q, q, cos, sin)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-6)

    def test_relative_property_1d_axis(self):
        """Attention logits depend only on relative offsets after RoPE."""
        d = 32
        q = jax.random.normal(jax.random.key(0), (1, 1, 1, d))
        k = jax.random.normal(jax.random.key(1), (1, 1, 1, d))

        def logit(pos_q, pos_k):
            cq, sq = compute_2d_freqs_cis(
                jnp.full((1, 1), pos_q, jnp.float32), jnp.zeros((1, 1)), d
            )
            ck, sk = compute_2d_freqs_cis(
                jnp.full((1, 1), pos_k, jnp.float32), jnp.zeros((1, 1)), d
            )
            qr, _ = apply_rotary_emb(q, q, cq, sq)
            kr, _ = apply_rotary_emb(k, k, ck, sk)
            return float(jnp.sum(qr * kr))

        assert abs(logit(3, 5) - logit(10, 12)) < 1e-4

    @pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
    def test_parity_with_reference(self):
        ref_mod = load_reference_ae()
        if ref_mod is None:
            pytest.skip("reference not importable")
        from vitok.models.modules.rotary_embedding import (
            apply_rotary_emb as ref_apply,
            compute_2d_freqs_cis as ref_freqs,
        )

        rng = np.random.default_rng(0)
        b, n, h, d = 2, 12, 3, 32
        q = rng.standard_normal((b, n, h, d)).astype(np.float32)
        k = rng.standard_normal((b, n, h, d)).astype(np.float32)
        row = rng.integers(0, 8, (b, n)).astype(np.float32)
        col = rng.integers(0, 8, (b, n)).astype(np.float32)

        cos_t, sin_t = ref_freqs(torch.tensor(row), torch.tensor(col), d)
        q_t, k_t = ref_apply(
            torch.tensor(q), torch.tensor(k), cos_t, sin_t
        )

        cos_j, sin_j = compute_2d_freqs_cis(jnp.array(row), jnp.array(col), d)
        q_j, k_j = apply_rotary_emb(jnp.array(q), jnp.array(k), cos_j, sin_j)

        np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(k_j), k_t.numpy(), atol=1e-5)

    def test_half_convention_is_permuted_interleaved(self):
        """rotate_half(x[perm]) == rotate_interleaved(x)[perm] — the load-time
        q/k channel permutation makes the two conventions exactly equivalent
        (so attention logits are unchanged)."""
        from vitok_tpu.ops.rope import rope_half_permutation

        d = 64
        rng = jax.random.key(3)
        q = jax.random.normal(rng, (2, 8, 2, d))
        k = jax.random.normal(jax.random.key(4), (2, 8, 2, d))
        row = jnp.tile(jnp.arange(8)[None], (2, 1)).astype(jnp.float32)
        col = row[:, ::-1]
        cos, sin = compute_2d_freqs_cis(row, col, d)

        perm = rope_half_permutation(d)
        qi, ki = apply_rotary_emb(q, k, cos, sin)  # interleaved
        qh, kh = apply_rotary_emb(
            q[..., perm], k[..., perm], cos, sin, convention="half"
        )
        np.testing.assert_allclose(
            np.asarray(qh), np.asarray(qi)[..., perm], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(kh), np.asarray(ki)[..., perm], atol=1e-6
        )


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


class TestNorms:
    def test_rms_norm_unit_scale(self):
        x = jax.random.normal(jax.random.key(0), (4, 8, 64)) * 3.0
        y = rms_norm(x, jnp.ones((64,)))
        rms = np.sqrt(np.mean(np.square(np.asarray(y)), axis=-1))
        np.testing.assert_allclose(rms, 1.0, atol=1e-3)

    def test_rms_norm_dtype_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (2, 4, 32)).astype(jnp.bfloat16)
        y = rms_norm(x, jnp.ones((32,)))
        assert y.dtype == jnp.bfloat16

    def test_layer_norm_whitens(self):
        x = jax.random.normal(jax.random.key(0), (4, 8, 64)) * 5.0 + 2.0
        y = np.asarray(layer_norm(x))
        np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-4)
        np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-2)

    @pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
    def test_rms_parity(self):
        ref_mod = load_reference_ae()
        if ref_mod is None:
            pytest.skip("reference not importable")
        from vitok.models.modules.norm import RMSNorm

        x = np.random.default_rng(1).standard_normal((2, 5, 48)).astype(np.float32)
        m = RMSNorm(48)
        with torch.no_grad():
            ref = m(torch.tensor(x)).numpy()
        ours = np.asarray(rms_norm(jnp.array(x), jnp.ones((48,))))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# SwiGLU
# ---------------------------------------------------------------------------


class TestSwiGLU:
    def test_round_hidden(self):
        # Reference rule: ((h + 8) // 16) * 16
        assert round_hidden_dim(2730) == 2736
        assert round_hidden_dim(2048) == 2048
        assert round_hidden_dim(100) == 96  # nearest multiple of 16

    @pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
    def test_parity(self):
        ref_mod = load_reference_ae()
        if ref_mod is None:
            pytest.skip("reference not importable")
        from vitok.models.modules.mlp import SwiGLU

        d, h = 32, 64
        m = SwiGLU(d, hidden_dim=h)
        x = np.random.default_rng(2).standard_normal((2, 5, d)).astype(np.float32)
        with torch.no_grad():
            ref = m(torch.tensor(x)).numpy()
        fc1 = m.fc1.weight.detach().numpy().T  # [d, 2h]
        fc2 = m.fc2.weight.detach().numpy().T  # [h, d]
        ours = np.asarray(swiglu(jnp.array(x), jnp.array(fc1), jnp.array(fc2)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


class TestAttention:
    def _qkv(self, b=2, n=16, h=2, d=32):
        ks = jax.random.split(jax.random.key(0), 3)
        return [jax.random.normal(k, (b, n, h, d)) for k in ks]

    def test_shapes(self):
        q, k, v = self._qkv()
        out = dot_product_attention(q, k, v, impl="xla")
        assert out.shape == q.shape

    def test_mask_blocks_padding(self):
        """Padded key tokens must not influence valid-query outputs."""
        q, k, v = self._qkv()
        mask = jnp.array([[True] * 10 + [False] * 6, [True] * 16])
        out1 = dot_product_attention(q, k, v, patch_mask=mask, impl="xla")
        # Corrupt the padded keys/values: valid outputs must not change.
        k2 = k.at[0, 10:].set(99.0)
        v2 = v.at[0, 10:].set(-99.0)
        out2 = dot_product_attention(q, k2, v2, patch_mask=mask, impl="xla")
        np.testing.assert_allclose(
            np.asarray(out1[0, :10]), np.asarray(out2[0, :10]), atol=1e-5
        )

    def test_sliding_window(self):
        q, k, v = self._qkv(n=32)
        out_sw = dot_product_attention(q, k, v, sliding_window=4, impl="xla")
        # A far-away key perturbation should not affect query 0 under SWA.
        k2 = k.at[:, 20:].set(50.0)
        out_sw2 = dot_product_attention(q, k2, v, sliding_window=4, impl="xla")
        np.testing.assert_allclose(
            np.asarray(out_sw[:, 0]), np.asarray(out_sw2[:, 0]), atol=1e-5
        )

    def test_make_attention_mask_combines(self):
        pm = jnp.array([[True, True, False, False]])
        m = make_attention_mask(pm, 4, sliding_window=1)
        m = np.asarray(m)[0, 0]
        assert m[0, 1] and not m[0, 2] and not m[0, 3]
        assert not m[0, 2]  # padded
        assert not m[1, 3]  # padded even though within any window

    @pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
    def test_parity_with_torch_sdpa(self):
        q, k, v = self._qkv(b=1, n=8, h=2, d=16)
        out = np.asarray(dot_product_attention(q, k, v, impl="xla"))
        # torch sdpa expects [B, H, N, D]
        tq = torch.tensor(np.asarray(q)).permute(0, 2, 1, 3)
        tk = torch.tensor(np.asarray(k)).permute(0, 2, 1, 3)
        tv = torch.tensor(np.asarray(v)).permute(0, 2, 1, 3)
        with torch.no_grad():
            ref = (
                torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
                .permute(0, 2, 1, 3)
                .numpy()
            )
        np.testing.assert_allclose(out, ref, atol=1e-5)
