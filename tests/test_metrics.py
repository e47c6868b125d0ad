"""Metric tests: Fréchet math, accumulators, SSIM/PSNR, MetricCalculator."""

import numpy as np
import pytest

import jax.numpy as jnp

from vitok_tpu.metrics import (
    MeanAccumulator,
    MeanCovAccumulator,
    MetricCalculator,
    calculate_frechet_distance,
    compute_psnr,
    compute_ssim,
)


class TestFrechet:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        mu = rng.standard_normal(8)
        a = rng.standard_normal((8, 8))
        sigma = a @ a.T + np.eye(8)
        assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift(self):
        mu1, mu2 = np.zeros(4), np.ones(4) * 2
        sigma = np.eye(4)
        # FID = ||mu1-mu2||² when covariances equal
        assert abs(calculate_frechet_distance(mu1, sigma, mu2, sigma) - 16.0) < 1e-6

    def test_singular_cov_eps_retry(self):
        mu = np.zeros(4)
        sigma = np.zeros((4, 4))  # singular
        d = calculate_frechet_distance(mu, sigma, mu, np.eye(4))
        assert np.isfinite(d)


class TestAccumulators:
    def test_mean_cov_matches_numpy(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((500, 16))
        acc = MeanCovAccumulator(16)
        for i in range(0, 500, 64):
            acc.update(x[i : i + 64])
        mu, cov = acc.finalize()
        np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
        np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-10)

    def test_merge(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((200, 8))
        a, b = MeanCovAccumulator(8), MeanCovAccumulator(8)
        a.update(x[:100])
        b.update(x[100:])
        a.merge(b)
        mu, cov = a.finalize()
        np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
        np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-10)

    def test_mean_accumulator(self):
        acc = MeanAccumulator()
        acc.update([1.0, 2.0])
        acc.update(3.0)
        assert abs(acc.finalize() - 2.0) < 1e-12


class TestImageMetrics:
    def test_ssim_identical(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (3, 64, 64)))
        assert compute_ssim(img, img) > 0.999

    def test_ssim_noise_lower(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(-1, 1, (3, 64, 64)))
        noisy = img + jnp.asarray(rng.normal(0, 0.3, (3, 64, 64)))
        assert compute_ssim(img, noisy) < compute_ssim(img, img)

    def test_ssim_small_image_adaptive_kernel(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (3, 7, 7)))
        assert np.isfinite(compute_ssim(img, img))

    def test_psnr_known_value(self):
        a = jnp.zeros((3, 16, 16))
        b = jnp.full((3, 16, 16), 0.2)
        # mse = 0.04, psnr = 10*log10(4/0.04) = 20
        assert abs(compute_psnr(a, b) - 20.0) < 1e-3

    @pytest.mark.skipif(
        not pytest.importorskip("torch", reason="torch unavailable"),
        reason="torch unavailable",
    )
    def test_ssim_parity_with_torchmetrics_recipe(self):
        """Our SSIM vs a reference gaussian-window computation in torch."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(3)
        x = rng.uniform(-1, 1, (1, 3, 48, 48)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1, x.shape), -1, 1).astype(np.float32)

        # torch-side independent implementation (gaussian 11x11 sigma 1.5)
        k = 11
        g = torch.exp(
            -((torch.arange(k, dtype=torch.float32) - (k - 1) / 2) ** 2)
            / (2 * 1.5 ** 2)
        )
        g = (g / g.sum()).outer(g / g.sum())
        w = g[None, None].repeat(3, 1, 1, 1)

        def filt(t):
            return F.conv2d(t, w, groups=3)

        tx, ty = torch.tensor(x), torch.tensor(y)
        c1, c2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2
        mx, my = filt(tx), filt(ty)
        vx = filt(tx * tx) - mx * mx
        vy = filt(ty * ty) - my * my
        vxy = filt(tx * ty) - mx * my
        smap = ((2 * mx * my + c1) * (2 * vxy + c2)) / (
            (mx * mx + my * my + c1) * (vx + vy + c2)
        )
        ref = float(smap.mean())

        ours = compute_ssim(jnp.asarray(x[0]), jnp.asarray(y[0]))
        assert abs(ours - ref) < 1e-4


class TestMetricCalculator:
    def _images(self, n=6, seed=0):
        rng = np.random.default_rng(seed)
        refs = [jnp.asarray(rng.uniform(-1, 1, (3, 32, 32)).astype(np.float32)) for _ in range(n)]
        recons = [
            jnp.clip(r + jnp.asarray(rng.normal(0, 0.1, (3, 32, 32)).astype(np.float32)), -1, 1)
            for r in refs
        ]
        return refs, recons

    def test_ssim_psnr_flow(self):
        refs, recons = self._images()
        calc = MetricCalculator(metrics=("ssim", "psnr"))
        calc.update(refs[:3], recons[:3])
        calc.update(refs[3:], recons[3:])
        stats = calc.gather()
        assert 0 < stats["ssim"] <= 1
        assert stats["psnr"] > 10
        assert stats["n_images"] == 6

    def test_fid_with_pluggable_extractor(self):
        """FID via a deterministic random-projection feature extractor."""
        rng = np.random.default_rng(0)
        proj = rng.standard_normal((3 * 32 * 32, 16)).astype(np.float32)

        def feat_fn(images):
            x = np.stack([np.asarray(i).ravel() for i in images])
            return x @ proj

        refs, recons = self._images(n=40)
        calc = MetricCalculator(metrics=("fid",), fid_feature_fn=feat_fn)
        calc.update(refs, recons)
        stats = calc.gather()
        assert np.isfinite(stats["fid"]) and stats["fid"] >= 0
        # identical inputs -> fid ~ 0
        calc2 = MetricCalculator(metrics=("fid",), fid_feature_fn=feat_fn)
        calc2.update(refs, refs)
        assert calc2.gather()["fid"] < 1e-4

    def test_missing_extractor_raises(self):
        with pytest.raises(ValueError):
            MetricCalculator(metrics=("fid",))
