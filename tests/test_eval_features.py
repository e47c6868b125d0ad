"""Bucketed-resize path of the eval feature extractors.

The exact path compiles one program per unique input shape
(``_jitted_group_resize``); the bucketed path pads to _BUCKET_QUANTUM
buckets and carries host-built separable resize weights as data
(zero rows over the padding), so a native-aspect eval
(reference `--pp-mode native`, /root/reference/scripts/eval_vae.py:96)
compiles O(buckets) programs, not O(unique shapes). These tests pin:
(a) numerics equal to ``jax.image.resize`` up to f32 contraction
rounding, (b) the compile count actually being bounded, (c) stream
order preserved across mixed buckets.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu import eval_features as EF


def _img(rng, c, h, w):
    return rng.standard_normal((c, h, w)).astype(np.float32)


@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
@pytest.mark.parametrize(
    "shape,size",
    [
        ((3, 200, 333), 299),  # mixed up/down, non-square
        ((3, 97, 145), 64),    # downscale
        ((3, 64, 48), 299),    # pure upscale (antialias no-op)
        ((3, 512, 300), 128),  # strong downscale
    ],
)
def test_bucketed_matches_exact(method, shape, size):
    rng = np.random.default_rng(0)
    imgs = [_img(rng, *shape) for _ in range(3)]
    exact = np.asarray(EF._resize_batch(imgs, size, method=method))
    bucketed = np.asarray(
        EF._resize_batch(imgs, size, method=method, bucketed=True)
    )
    assert bucketed.shape == exact.shape == (3, shape[0], size, size)
    np.testing.assert_allclose(bucketed, exact, atol=1e-4)


def test_weight_mat_matches_jax_compute_weight_mat():
    """The numpy weight builder mirrors jax.image's compute_weight_mat."""
    from jax._src.image import scale as jscale

    for in_size, out_size in [(333, 299), (97, 64), (48, 299)]:
        ours = EF._resize_weights_np(in_size, out_size, "bicubic", in_size)
        theirs = np.asarray(
            jscale.compute_weight_mat(
                in_size,
                out_size,
                np.float32(out_size) / np.float32(in_size),
                np.float32(0.0),
                jscale._kernels[jscale.ResizeMethod.CUBIC],
                antialias=True,
            )
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6, rtol=1e-6)


def test_compile_count_bounded_by_buckets():
    """50 distinct shapes inside one bucket -> exactly one compiled program."""
    EF._jitted_bucket_resize.cache_clear()
    rng = np.random.default_rng(1)
    shapes = [(3, 130 + i, 150 + 2 * i) for i in range(50)]  # all <= 256
    imgs = [_img(rng, *s) for s in shapes]
    out = EF._resize_batch(imgs, 64, method="bilinear", bucketed=True)
    assert out.shape == (50, 3, 64, 64)
    assert EF._jitted_bucket_resize.cache_info().currsize == 1
    # Exact-path equivalent would have compiled one program per shape.


def test_mixed_bucket_stream_order():
    """Images spanning two buckets come back in input order."""
    rng = np.random.default_rng(2)
    small = [_img(rng, 3, 100, 100) for _ in range(2)]   # 256-bucket
    large = [_img(rng, 3, 300, 280) for _ in range(2)]   # 512-bucket
    imgs = [small[0], large[0], small[1], large[1]]      # interleaved
    out = np.asarray(EF._resize_batch(imgs, 32, method="bilinear",
                                      bucketed=True))
    ref = [
        np.asarray(EF._resize_batch([im], 32, method="bilinear"))[0]
        for im in imgs
    ]
    for i in range(4):
        np.testing.assert_allclose(out[i], ref[i], atol=2e-5, rtol=2e-5)


def test_feature_fn_bucketed_resize_flag():
    rng = np.random.default_rng(3)
    imgs = [_img(rng, 3, 90 + 7 * i, 120 + 3 * i) for i in range(4)]
    exact_fn = EF.random_projection_feature_fn(dim=16, size=32, seed=0)
    bucket_fn = EF.random_projection_feature_fn(
        dim=16, size=32, seed=0, bucketed_resize=True
    )
    np.testing.assert_allclose(
        bucket_fn(imgs), exact_fn(imgs), atol=5e-5, rtol=5e-5
    )
