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

    def test_model_classes_match_reference(self):
        """Class routing must mirror reference baselines.py:23-67."""
        assert BASELINES["flux"].model_class == "kl"
        assert BASELINES["sdxl"].model_class == "kl"
        assert BASELINES["sd"].model_class == "kl"
        assert BASELINES["qwen"].model_class == "qwen"
        assert BASELINES["dc-ae-f32"].model_class == "dc"
        assert BASELINES["dc-ae-f64"].model_class == "dc"
        assert BASELINES["flux"].subfolder == "vae"


torch = pytest.importorskip("torch")


class _Dist:
    """latent_dist stand-in (diffusers DiagonalGaussianDistribution API)."""

    def __init__(self, mean):
        self._mean = mean

    def mode(self):
        return self._mean

    def sample(self, generator=None):
        return self._mean + 1.0  # distinguishable from mode()


class _Out:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _FakeDiffusersVAE(torch.nn.Module):
    """Faithful fake of the three diffusers autoencoder APIs: KL returns
    .latent_dist, DC returns .latent, Qwen is video-shaped [B,C,T,H,W]."""

    def __init__(self, kind, stride=8, channels=4):
        super().__init__()
        self.kind = kind
        self.stride = stride
        self.channels = channels
        self.p = torch.nn.Parameter(torch.zeros(1))  # dtype/device probe

    def _pool(self, x):
        b, c, h, w = x.shape
        s = self.stride
        pooled = x.reshape(b, c, h // s, s, w // s, s).mean(dim=(3, 5))
        reps = -(-self.channels // c)
        return pooled.repeat(1, reps, 1, 1)[:, : self.channels]

    def encode(self, x):
        if self.kind == "qwen":
            assert x.dim() == 5 and x.shape[2] == 1, x.shape  # frame dim!
            z = self._pool(x.squeeze(2)).unsqueeze(2)
            return _Out(latent_dist=_Dist(z))
        if self.kind == "dc":
            return _Out(latent=self._pool(x))
        return _Out(latent_dist=_Dist(self._pool(x)))

    def decode(self, z):
        if self.kind == "qwen":
            assert z.dim() == 5 and z.shape[2] == 1, z.shape
            z = z.squeeze(2)
            x = z[:, :3].repeat_interleave(self.stride, 2).repeat_interleave(self.stride, 3)
            return _Out(sample=x.unsqueeze(2))
        x = z[:, :3].repeat_interleave(self.stride, 2).repeat_interleave(self.stride, 3)
        return _Out(sample=x)


class TestTorchBackendAdapters:
    """The per-class adapters handle each diffusers API's quirks."""

    def _roundtrip(self, name, kind, stride, channels):
        from scripts.eval.baselines import _BACKEND_CLASSES, BASELINES

        adapter = _BACKEND_CLASSES[kind][1]
        backend = adapter(_FakeDiffusersVAE(kind, stride, channels), torch)
        vae = BaselineVAE(name, autoencoder=backend, dtype=jnp.float32)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 3, 50, 30)),
            jnp.float32,
        )
        out = vae(x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_kl_adapter(self):
        self._roundtrip("sdxl", "kl", 8, 4)

    def test_qwen_adapter_frame_dim(self):
        self._roundtrip("qwen", "qwen", 8, 16)

    def test_dc_adapter_latent_attr(self):
        self._roundtrip("dc-ae-f32", "dc", 32, 32)

    def test_kl_deterministic_uses_mode(self):
        from scripts.eval.baselines import TorchKLBackend

        fake = _FakeDiffusersVAE("kl", 8, 4)
        det = TorchKLBackend(fake, torch, deterministic=True)
        smp = TorchKLBackend(fake, torch, deterministic=False)
        x = np.zeros((1, 3, 16, 16), np.float32)
        z_det = det.encode(x)
        z_smp = smp.encode(x)
        np.testing.assert_allclose(z_smp, z_det + 1.0, atol=1e-6)
