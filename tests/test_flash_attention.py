"""Pallas flash-attention kernel vs the XLA reference path.

Runs the actual kernel in interpreter mode on CPU (same code path as TPU
modulo Mosaic compilation), checking masking, sliding windows, padding, and
gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.ops.attention import _xla_attention, make_attention_mask
from vitok_tpu.ops.flash_attention import flash_attention


def qkv(b=1, n=256, h=2, d=64, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    return [jax.random.normal(k, (b, n, h, d), dtype) for k in ks]


def xla_ref(q, k, v, patch_mask=None, sliding_window=None):
    mask = make_attention_mask(patch_mask, q.shape[1], sliding_window)
    return _xla_attention(q, k, v, mask)


class TestFlashForward:
    def test_unmasked_matches_xla(self):
        q, k, v = qkv(b=2, n=256, h=2, d=64)
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = xla_ref(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_non_block_multiple_n(self):
        q, k, v = qkv(n=200)
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = xla_ref(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_patch_mask(self):
        q, k, v = qkv(b=2, n=256)
        mask = jnp.zeros((2, 256), bool).at[0, :100].set(True).at[1, :256].set(True)
        out = flash_attention(q, k, v, patch_mask=mask, block_q=128, block_k=128)
        ref = xla_ref(q, k, v, patch_mask=mask)
        m = np.asarray(mask)
        np.testing.assert_allclose(
            np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5
        )

    def test_masked_rows_are_zero_not_nan(self):
        q, k, v = qkv(b=1, n=128)
        mask = jnp.zeros((1, 128), bool).at[0, :64].set(True)
        out = np.asarray(
            flash_attention(q, k, v, patch_mask=mask, block_q=128, block_k=128)
        )
        assert not np.isnan(out).any()
        np.testing.assert_allclose(out[0, 64:], 0.0)

    def test_sliding_window(self):
        q, k, v = qkv(n=256)
        out = flash_attention(q, k, v, sliding_window=32, block_q=128, block_k=128)
        ref = xla_ref(q, k, v, sliding_window=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_sliding_window_with_mask(self):
        q, k, v = qkv(b=2, n=256)
        mask = jnp.zeros((2, 256), bool).at[:, :180].set(True)
        out = flash_attention(
            q, k, v, patch_mask=mask, sliding_window=16, block_q=128, block_k=128
        )
        ref = xla_ref(q, k, v, patch_mask=mask, sliding_window=16)
        m = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5)

    def test_bf16(self):
        q, k, v = qkv(n=256, dtype=jnp.bfloat16)
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = xla_ref(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )

    def test_head_dim_128(self):
        q, k, v = qkv(n=128, d=128)
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = xla_ref(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFlashBackward:
    def test_grads_match_xla(self):
        q, k, v = qkv(n=128)
        mask = jnp.ones((1, 128), bool).at[0, 100:].set(False)

        # Downstream losses always mask padded tokens; dead-query rows differ
        # between backends by design (flash zeroes them, XLA leaves garbage).
        w = mask[..., None, None].astype(jnp.float32)

        def loss_flash(q_, k_, v_):
            out = flash_attention(
                q_, k_, v_, patch_mask=mask, block_q=128, block_k=128
            )
            return jnp.sum((out * w) ** 2)

        def loss_ref(q_, k_, v_):
            return jnp.sum((xla_ref(q_, k_, v_, patch_mask=mask) * w) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            # Grads on masked-out tokens may differ (both ignored downstream);
            # compare valid region.
            np.testing.assert_allclose(
                np.asarray(a)[:, :100], np.asarray(b)[:, :100], atol=1e-4
            )


class TestBlockPaddingRegression:
    @pytest.mark.parametrize("n", [300, 384, 700])
    def test_awkward_lengths_fully_written(self, n):
        """N between block multiples must not drop trailing query blocks
        (regression: pad used max(bq, bk) instead of lcm)."""
        q, k, v = qkv(n=n, h=2, d=64)
        out = flash_attention(q, k, v, block_q=256, block_k=512)
        ref = xla_ref(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )


class TestChunkedBackward:
    def test_large_n_grads_match_direct(self):
        """Above the chunk threshold, grads must equal the direct vjp."""
        import vitok_tpu.ops.flash_attention as fa

        old = fa._BWD_CHUNK_THRESHOLD
        old_impl = fa._BWD_IMPL
        fa._BWD_IMPL = "xla"  # exercise the fallback path
        fa._BWD_CHUNK_THRESHOLD = 128  # force the chunked path at small N
        try:
            q, k, v = qkv(n=384, h=2, d=32)
            mask = jnp.ones((1, 384), bool).at[0, 350:].set(False)
            w = mask[..., None, None].astype(jnp.float32)

            def loss(q_, k_, v_):
                out = flash_attention(
                    q_, k_, v_, patch_mask=mask, sliding_window=64,
                    block_q=128, block_k=128,
                )
                return jnp.sum((out * w) ** 2)

            gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

            def loss_ref(q_, k_, v_):
                out = xla_ref(q_, k_, v_, patch_mask=mask, sliding_window=64)
                return jnp.sum((out * w) ** 2)

            gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
            m = np.asarray(mask)[0]
            for a, b in zip(gf, gr):
                np.testing.assert_allclose(
                    np.asarray(a)[0][m], np.asarray(b)[0][m], atol=2e-4
                )
        finally:
            fa._BWD_CHUNK_THRESHOLD = old
            fa._BWD_IMPL = old_impl


@pytest.fixture()
def force_pallas_bwd():
    """Pin the flash dq/dkv kernels (auto would route small test N to XLA)."""
    import vitok_tpu.ops.flash_attention as fa

    old = fa._BWD_IMPL
    fa._BWD_IMPL = "pallas"
    yield
    fa._BWD_IMPL = old


@pytest.mark.usefixtures("force_pallas_bwd")
class TestPallasBackward:
    """The flash dq/dkv kernels (large-N backward) vs the XLA vjp."""

    def _check(self, q, k, v, patch_mask=None, sliding_window=None,
               block_q=128, block_k=128, atol=1e-4):
        n = q.shape[1]
        if patch_mask is None:
            w = jnp.ones((q.shape[0], n, 1, 1), jnp.float32)
        else:
            w = patch_mask[..., None, None].astype(jnp.float32)
        # An asymmetric cotangent so dq/dk/dv are all nontrivial.
        cot = jnp.linspace(0.5, 1.5, n)[None, :, None, None] * w

        def loss_flash(q_, k_, v_):
            out = flash_attention(
                q_, k_, v_, patch_mask=patch_mask,
                sliding_window=sliding_window,
                block_q=block_q, block_k=block_k,
            )
            return jnp.sum(out * cot)

        def loss_ref(q_, k_, v_):
            out = xla_ref(
                q_, k_, v_, patch_mask=patch_mask,
                sliding_window=sliding_window,
            )
            return jnp.sum(out * cot)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        m = (
            np.ones(n, bool)
            if patch_mask is None
            else np.asarray(patch_mask)[0]
        )
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32)[0][m],
                np.asarray(b, np.float32)[0][m],
                atol=atol,
            )

    def test_unmasked(self):
        q, k, v = qkv(n=256)
        self._check(q, k, v)

    def test_patch_mask(self):
        q, k, v = qkv(n=256)
        mask = jnp.ones((1, 256), bool).at[0, 200:].set(False)
        self._check(q, k, v, patch_mask=mask)

    def test_sliding_window(self):
        q, k, v = qkv(n=512)
        self._check(q, k, v, sliding_window=96)

    def test_sliding_window_with_mask(self):
        q, k, v = qkv(n=512)
        mask = jnp.ones((1, 512), bool).at[0, 450:].set(False)
        self._check(q, k, v, patch_mask=mask, sliding_window=64)

    def test_non_block_multiple_n(self):
        q, k, v = qkv(n=300)
        self._check(q, k, v)

    def test_uneven_blocks(self):
        q, k, v = qkv(n=768)
        self._check(q, k, v, block_q=128, block_k=256)

    def test_batch_with_varying_valid(self):
        q, k, v = qkv(b=3, n=256)
        mask = jnp.zeros((3, 256), bool)
        mask = mask.at[0, :256].set(True).at[1, :100].set(True)
        mask = mask.at[2, :129].set(True)
        import vitok_tpu.ops.flash_attention as fa

        w = mask[..., None, None].astype(jnp.float32)

        def loss_flash(q_, k_, v_):
            out = flash_attention(
                q_, k_, v_, patch_mask=mask, block_q=128, block_k=128
            )
            return jnp.sum((out * w) ** 2)

        def loss_ref(q_, k_, v_):
            return jnp.sum((xla_ref(q_, k_, v_, patch_mask=mask) * w) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        m = np.asarray(mask)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a)[m], np.asarray(b)[m], atol=1e-4
            )

    def test_bf16(self):
        q, k, v = qkv(n=256, dtype=jnp.bfloat16)
        self._check(q, k, v, atol=5e-2)

    def test_no_nan_all_masked_sample(self):
        q, k, v = qkv(b=2, n=128)
        mask = jnp.zeros((2, 128), bool).at[0, :64].set(True)  # sample 1 dead

        def loss(q_, k_, v_):
            out = flash_attention(
                q_, k_, v_, patch_mask=mask, block_q=128, block_k=128
            )
            return jnp.sum(out ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a in g:
            assert not np.isnan(np.asarray(a)).any()
