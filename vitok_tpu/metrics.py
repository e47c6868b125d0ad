"""Evaluation metrics: Fréchet distances (FID/FDD), SSIM, PSNR.

Capability parity with reference ``vitok/metrics.py`` (Na-VAE/vitok-release):
the same update/gather accumulator design, fp64 mean+covariance streaming,
eps-regularized ``sqrtm`` Fréchet distance, per-image SSIM/PSNR at native
size — but TPU-native: SSIM/PSNR run as jitted JAX ops, distributed
reduction uses ``psum``-style allreduce over the mesh (or multihost utils)
instead of NCCL, and feature extractors are pluggable jit-able callables so
the FID backbone can be a JAX InceptionV3/DINO port or any local model
(the reference hard-codes pytorch_fid's CUDA InceptionV3).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vitok_tpu.losses import psnr as _psnr_fn, ssim as _ssim_fn

Array = jax.Array
FeatureFn = Callable[[Array], np.ndarray]


# ---------------------------------------------------------------------------
# Fréchet distance (reference metrics.py:23-44 semantics)
# ---------------------------------------------------------------------------


def calculate_frechet_distance(
    mu1: np.ndarray,
    sigma1: np.ndarray,
    mu2: np.ndarray,
    sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Classic FID formula with eps-regularized sqrtm retry."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset), disp=False
        )[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


# ---------------------------------------------------------------------------
# Streaming fp64 mean + covariance (reference distributed_mean_cov)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MeanCovAccumulator:
    """Streams n / Σx / Σ(x xᵀ) in fp64; mergeable across hosts."""

    dim: int
    n: float = 0.0
    s: Optional[np.ndarray] = None
    outer: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.s is None:
            self.s = np.zeros((self.dim,), np.float64)
        if self.outer is None:
            self.outer = np.zeros((self.dim, self.dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.s += f.sum(axis=0)
        self.outer += f.T @ f

    def merge(self, other: "MeanCovAccumulator") -> None:
        self.n += other.n
        self.s += other.s
        self.outer += other.outer

    def allreduce(self) -> None:
        """Cross-process reduction (TPU-native analog of NCCL all_reduce)."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        stacked = np.concatenate(
            [[self.n], self.s, self.outer.ravel()]
        )
        summed = np.asarray(
            multihost_utils.process_allgather(stacked)
        ).sum(axis=0)
        self.n = float(summed[0])
        self.s = summed[1 : 1 + self.dim]
        self.outer = summed[1 + self.dim :].reshape(self.dim, self.dim)

    def finalize(self):
        if self.n < 2:
            raise ValueError("Need >= 2 samples for covariance")
        mu = self.s / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


# ---------------------------------------------------------------------------
# Scalar accumulator (reference dist_mean_1d)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MeanAccumulator:
    total: float = 0.0
    count: float = 0.0

    def update(self, values) -> None:
        v = np.asarray(values, np.float64).ravel()
        self.total += v.sum()
        self.count += v.size

    def allreduce(self) -> None:
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        summed = np.asarray(
            multihost_utils.process_allgather(
                np.array([self.total, self.count])
            )
        ).sum(axis=0)
        self.total, self.count = float(summed[0]), float(summed[1])

    def finalize(self) -> float:
        return self.total / max(self.count, 1.0)


# ---------------------------------------------------------------------------
# SSIM / PSNR at native size (jitted per-shape)
# ---------------------------------------------------------------------------


def compute_ssim(ref: Array, recon: Array, data_range: float = 2.0) -> float:
    """SSIM for one image pair ``[C, H, W]`` (adaptive odd kernel <= 11)."""
    return float(
        _ssim_fn(ref[None], recon[None], data_range=data_range, reduce=True)
    )


def compute_psnr(ref: Array, recon: Array, data_range: float = 2.0) -> float:
    return float(_psnr_fn(ref[None], recon[None], data_range=data_range))


# ---------------------------------------------------------------------------
# MetricCalculator (reference metrics.py:122-301)
# ---------------------------------------------------------------------------


class MetricCalculator:
    """update/gather metric accumulator over (reference, reconstruction) pairs.

    Args:
        metrics: subset of {"fid", "fdd", "ssim", "psnr"}.
        fid_feature_fn / fdd_feature_fn: callables mapping a ``[B, C, H, W]``
            batch in [-1, 1] to ``[B, F]`` numpy features. For rFID parity
            with the reference, plug an InceptionV3 pool-2048 extractor (see
            ``vitok_tpu.eval.features``); FDD uses a DINO backbone.
        chunk: feature-extraction micro-batch (reference: 64).
    """

    def __init__(
        self,
        metrics: Sequence[str] = ("ssim", "psnr"),
        fid_feature_fn: Optional[FeatureFn] = None,
        fdd_feature_fn: Optional[FeatureFn] = None,
        chunk: int = 64,
        data_range: float = 2.0,
    ):
        self.metrics = tuple(metrics)
        self.chunk = chunk
        self.data_range = data_range
        self._fid_fn = fid_feature_fn
        self._fdd_fn = fdd_feature_fn
        if "fid" in self.metrics and fid_feature_fn is None:
            raise ValueError("fid metric requires fid_feature_fn")
        if "fdd" in self.metrics and fdd_feature_fn is None:
            raise ValueError("fdd metric requires fdd_feature_fn")
        self._fid_ref: Optional[MeanCovAccumulator] = None
        self._fid_rec: Optional[MeanCovAccumulator] = None
        self._fdd_ref: Optional[MeanCovAccumulator] = None
        self._fdd_rec: Optional[MeanCovAccumulator] = None
        self._ssim = MeanAccumulator()
        self._psnr = MeanAccumulator()
        self._n_images = 0

    def _extract(self, fn: FeatureFn, images: List[Array]) -> np.ndarray:
        feats = []
        for i in range(0, len(images), self.chunk):
            batch = images[i : i + self.chunk]
            # Feature extractors need a uniform spatial size per call; callers
            # resize inside fn (reference: 299² inception, 512² DINO).
            feats.append(np.asarray(fn(batch)))
        return np.concatenate(feats, axis=0)

    def update(self, refs: List[Array], recons: List[Array]) -> None:
        """Accumulate a batch of per-image tensors ``[C, H, W]`` in [-1, 1]."""
        assert len(refs) == len(recons)
        self._n_images += len(refs)

        if "ssim" in self.metrics or "psnr" in self.metrics:
            # Batch per shape group: SSIM/PSNR are per-image independent, so
            # stacking same-shape pairs gives identical numbers in ONE
            # device dispatch per shape instead of one per image — on a
            # remote runtime the per-image path bills ~2 RTT x images
            # (measured 90s of a 118s eval loop, round 5).
            groups: dict = {}
            for r, x in zip(refs, recons):
                groups.setdefault(tuple(np.shape(r)), []).append((r, x))
            for pairs in groups.values():
                rs = jnp.stack([jnp.asarray(r) for r, _ in pairs])
                xs = jnp.stack([jnp.asarray(x) for _, x in pairs])
                if "ssim" in self.metrics:
                    self._ssim.update(np.asarray(
                        _ssim_fn(rs, xs, data_range=self.data_range,
                                 reduce=False)
                    ))
                if "psnr" in self.metrics:
                    self._psnr.update(np.asarray(
                        _psnr_fn(rs, xs, data_range=self.data_range,
                                 reduce=False)
                    ))

        if "fid" in self.metrics:
            f_ref = self._extract(self._fid_fn, refs)
            f_rec = self._extract(self._fid_fn, recons)
            if self._fid_ref is None:
                self._fid_ref = MeanCovAccumulator(f_ref.shape[1])
                self._fid_rec = MeanCovAccumulator(f_rec.shape[1])
            self._fid_ref.update(f_ref)
            self._fid_rec.update(f_rec)
        if "fdd" in self.metrics:
            f_ref = self._extract(self._fdd_fn, refs)
            f_rec = self._extract(self._fdd_fn, recons)
            if self._fdd_ref is None:
                self._fdd_ref = MeanCovAccumulator(f_ref.shape[1])
                self._fdd_rec = MeanCovAccumulator(f_rec.shape[1])
            self._fdd_ref.update(f_ref)
            self._fdd_rec.update(f_rec)

    def gather(self) -> Dict[str, float]:
        """Final stats with cross-process reduction."""
        out: Dict[str, float] = {"n_images": float(self._n_images)}
        if "ssim" in self.metrics:
            self._ssim.allreduce()
            out["ssim"] = self._ssim.finalize()
        if "psnr" in self.metrics:
            self._psnr.allreduce()
            out["psnr"] = self._psnr.finalize()
        for name, acc_ref, acc_rec in (
            ("fid", self._fid_ref, self._fid_rec),
            ("fdd", self._fdd_ref, self._fdd_rec),
        ):
            if name in self.metrics and acc_ref is not None:
                acc_ref.allreduce()
                acc_rec.allreduce()
                mu1, s1 = acc_ref.finalize()
                mu2, s2 = acc_rec.finalize()
                out[name] = calculate_frechet_distance(mu1, s1, mu2, s2)
        return out


__all__ = [
    "calculate_frechet_distance",
    "MeanCovAccumulator",
    "MeanAccumulator",
    "MetricCalculator",
    "compute_ssim",
    "compute_psnr",
]
