"""BaselineVAE wrapper tests with an injected fake autoencoder."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.eval.baselines import BASELINES, BaselineVAE, pad_to_stride


class FakeAE:
    """Identity-ish conv VAE stand-in: downsample by stride, upsample back."""

    def __init__(self, stride, channels):
        self.stride = stride
        self.channels = channels

    def encode(self, x):
        b, c, h, w = x.shape
        s = self.stride
        pooled = x.reshape(b, c, h // s, s, w // s, s).mean(axis=(3, 5))
        reps = self.channels // c + 1
        return jnp.tile(pooled, (1, reps, 1, 1))[:, : self.channels]

    def decode(self, z):
        x = z[:, :3]
        return jnp.repeat(jnp.repeat(x, self.stride, 2), self.stride, 3)


class TestBaselineVAE:
    def test_registry(self):
        for name in ("flux", "sdxl", "sd", "qwen", "dc-ae-f32", "dc-ae-f64"):
            assert name in BASELINES
        assert BASELINES["dc-ae-f32"].spatial_stride == 32
        assert BASELINES["dc-ae-f64"].spatial_stride == 64
        assert BASELINES["flux"].spatial_stride == 8

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            BaselineVAE("nope")

    def test_pad_to_stride(self):
        x = jnp.zeros((1, 3, 50, 30))
        padded, h, w = pad_to_stride(x, 8)
        assert padded.shape == (1, 3, 56, 32)
        assert (h, w) == (50, 30)
        same, _, _ = pad_to_stride(jnp.zeros((1, 3, 64, 64)), 8)
        assert same.shape == (1, 3, 64, 64)

    def test_roundtrip_crops_back(self):
        vae = BaselineVAE("flux", autoencoder=FakeAE(8, 16), dtype=jnp.float32)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 3, 50, 30)), jnp.float32
        )
        out = vae(x)
        assert out.shape == x.shape

    def test_scaling_factors_applied(self):
        spec_scale = BASELINES["sdxl"].scaling_factor
        vae = BaselineVAE("sdxl", autoencoder=FakeAE(8, 4), dtype=jnp.float32)
        x = jnp.ones((1, 3, 16, 16))
        latents, h, w = vae.encode(x)
        raw = FakeAE(8, 4).encode(x)
        np.testing.assert_allclose(
            np.asarray(latents), np.asarray(raw) * spec_scale, atol=1e-6
        )

    def test_missing_backend_raises_clearly(self):
        vae = BaselineVAE("sd")
        with pytest.raises(RuntimeError, match="diffusers"):
            vae(jnp.zeros((1, 3, 32, 32)))
