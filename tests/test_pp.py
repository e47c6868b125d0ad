"""NaFlex preprocessing tests.

Modeled on the reference's strongest test file (``tests/cpu/test_pp.py``):
DSL parsing, op behavior, patchify invariants (token budget, grid
consistency, spatial indices), the exact patchify->unpatchify roundtrip, and
postprocess formats. All numpy/JAX — no torch needed.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from vitok_tpu.pp import (
    OPS,
    build_transform,
    fit_to_token_budget,
    parse_op,
    patchify_array,
    patchify_image,
    postprocess,
    preprocess,
    sample_tiles,
    unpack,
    unpatchify,
)
from vitok_tpu.pp.io import patch_collate_fn


def make_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


SIZES = [(256, 256), (320, 240), (123, 77), (512, 128), (64, 64)]


# ---------------------------------------------------------------------------
# DSL
# ---------------------------------------------------------------------------


class TestDSL:
    def test_parse_simple(self):
        assert parse_op("resize_longest_side(256)") == (
            "resize_longest_side", (256,), {},
        )

    def test_parse_bare(self):
        assert parse_op("flip") == ("flip", (), {})

    def test_parse_bare_identifier_arg(self):
        name, args, kwargs = parse_op("normalize(minus_one_to_one)")
        assert args == ("minus_one_to_one",)

    def test_parse_kwargs(self):
        name, args, kwargs = parse_op("random_resized_crop(256, scale=(0.8, 1.0))")
        assert args == (256,)
        assert kwargs == {"scale": (0.8, 1.0)}

    def test_parse_invalid(self):
        with pytest.raises(ValueError):
            parse_op("")
        with pytest.raises(ValueError):
            parse_op("bad-name(1)")

    def test_unknown_op_raises(self):
        with pytest.raises(KeyError):
            build_transform("definitely_not_an_op(3)")

    def test_empty_pipeline_is_identity(self):
        t = build_transform("")
        assert t(42) == 42

    def test_registry_contents(self):
        for name in [
            "center_crop", "random_resized_crop", "resize_longest_side",
            "resize_to_token_budget", "flip", "identity", "random_choice",
            "to_tensor", "normalize", "patchify",
        ]:
            assert name in OPS


# ---------------------------------------------------------------------------
# Ops
# ---------------------------------------------------------------------------


class TestOps:
    def test_resize_longest_side(self):
        img = make_image(512, 256)
        out = OPS["resize_longest_side"](128)(img)
        assert max(out.size) == 128
        assert out.size == (128, 64)
        # No upscale
        assert OPS["resize_longest_side"](1024)(img).size == (512, 256)

    def test_center_crop(self):
        out = OPS["center_crop"](128)(make_image(640, 480))
        assert out.size == (128, 128)

    def test_random_resized_crop(self):
        out = OPS["random_resized_crop"](96)(make_image(300, 200))
        assert out.size == (96, 96)

    def test_to_tensor_range_and_layout(self):
        arr = OPS["to_tensor"]()(make_image(32, 16))
        assert arr.shape == (3, 16, 32)
        assert arr.dtype == np.float32
        assert 0.0 <= arr.min() and arr.max() <= 1.0

    def test_normalize_minus_one_to_one(self):
        arr = np.ones((3, 4, 4), np.float32)
        out = OPS["normalize"]("minus_one_to_one")(arr)
        np.testing.assert_allclose(out, 1.0)
        out0 = OPS["normalize"]("minus_one_to_one")(np.zeros((3, 4, 4), np.float32))
        np.testing.assert_allclose(out0, -1.0)

    def test_normalize_unknown_mode(self):
        with pytest.raises(ValueError):
            OPS["normalize"]("nope")

    def test_random_choice(self):
        t = OPS["random_choice"](["identity", "identity"], [0.5, 0.5])
        assert t(7) == 7
        with pytest.raises(ValueError):
            OPS["random_choice"]([], [])
        with pytest.raises(ValueError):
            OPS["random_choice"](["identity"], [0.5, 0.5])


# ---------------------------------------------------------------------------
# Token budget
# ---------------------------------------------------------------------------


class TestTokenBudget:
    @pytest.mark.parametrize("h,w", [(256, 256), (1000, 500), (77, 123), (16, 4096)])
    def test_budget_respected(self, h, w):
        import math

        th, tw = fit_to_token_budget(h, w, 16, 256)
        assert th <= h and tw <= w
        assert math.ceil(th / 16) * math.ceil(tw / 16) <= 256

    def test_within_budget_unchanged(self):
        assert fit_to_token_budget(256, 256, 16, 256) == (256, 256)

    def test_resize_op(self):
        import math

        op = OPS["resize_to_token_budget"](16, 64)
        out = op(np.zeros((3, 512, 512), np.float32))
        c, h, w = out.shape
        assert math.ceil(h / 16) * math.ceil(w / 16) <= 64


# ---------------------------------------------------------------------------
# Patchify invariants
# ---------------------------------------------------------------------------


class TestPatchify:
    def test_keys_and_shapes(self):
        d = patchify_array(np.zeros((3, 64, 48), np.float32), 16, 256)
        assert d["patches"].shape == (256, 3 * 16 * 16)
        assert d["patch_mask"].shape == (256,)
        assert int(d["patch_mask"].sum()) == 4 * 3
        assert d["grid_rows"] == 4 and d["grid_cols"] == 3
        assert d["orig_height"] == 64 and d["orig_width"] == 48

    def test_non_multiple_padding(self):
        d = patchify_array(np.ones((3, 50, 30), np.float32), 16, 256)
        # 50 -> 4 rows, 30 -> 2 cols
        assert d["grid_rows"] == 4 and d["grid_cols"] == 2
        assert d["orig_height"] == 50 and d["orig_width"] == 30

    def test_spatial_indices_row_major(self):
        d = patchify_array(np.zeros((3, 32, 48), np.float32), 16, 16)
        n = 2 * 3
        np.testing.assert_array_equal(d["row_idx"][:n], [0, 0, 0, 1, 1, 1])
        np.testing.assert_array_equal(d["col_idx"][:n], [0, 1, 2, 0, 1, 2])

    def test_over_budget_raises(self):
        with pytest.raises(ValueError):
            patchify_array(np.zeros((3, 256, 256), np.float32), 16, 64)

    def test_patch_pixel_layout(self):
        """Pixel (c, y, x) of patch (r, q) must be at the unfold position."""
        img = np.arange(3 * 32 * 32, dtype=np.float32).reshape(3, 32, 32)
        d = patchify_array(img, 16, 16)
        # patch (1, 1), channel 2, local pixel (3, 5)
        patch_idx = 1 * 2 + 1
        flat = d["patches"][patch_idx]
        val = flat[2 * 256 + 3 * 16 + 5]
        assert val == img[2, 16 + 3, 16 + 5]


# ---------------------------------------------------------------------------
# Roundtrip (the correctness anchor)
# ---------------------------------------------------------------------------


class TestRoundtrip:
    @pytest.mark.parametrize("w,h", SIZES)
    def test_exact_roundtrip(self, w, h):
        """patchify -> unpatchify -> unpack is bit-exact (no resize)."""
        rng = np.random.default_rng(42)
        img = rng.standard_normal((3, h, w)).astype(np.float32)
        d = patchify_array(img, 16, 2048)
        batched = patch_collate_fn([d])
        recon = unpatchify(batched, patch=16)
        crops = unpack(recon, batched["orig_height"], batched["orig_width"])
        assert crops[0].shape == img.shape
        np.testing.assert_array_equal(crops[0], img)

    def test_mixed_batch_roundtrip(self):
        """A batch with different grids per sample reconstructs each image."""
        rng = np.random.default_rng(7)
        imgs = [
            rng.standard_normal((3, 64, 64)).astype(np.float32),
            rng.standard_normal((3, 32, 96)).astype(np.float32),
        ]
        ds = [patchify_array(i, 16, 64) for i in imgs]
        batched = patch_collate_fn(ds)
        recon = unpatchify(batched, patch=16)
        crops = unpack(recon, batched["orig_height"], batched["orig_width"])
        for crop, img in zip(crops, imgs):
            np.testing.assert_array_equal(crop, img)

    def test_device_patchify_matches_host(self):
        rng = np.random.default_rng(3)
        imgs = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        dev = patchify_image(jnp.asarray(imgs), patch=16)
        host = patch_collate_fn([patchify_array(i, 16, 16) for i in imgs])
        np.testing.assert_allclose(np.asarray(dev["patches"]), host["patches"])
        np.testing.assert_array_equal(np.asarray(dev["row_idx"]), host["row_idx"])

    def test_unpatchify_max_grid_size(self):
        rng = np.random.default_rng(5)
        img = rng.standard_normal((3, 32, 32)).astype(np.float32)
        batched = patch_collate_fn([patchify_array(img, 16, 16)])
        recon = unpatchify(batched, patch=16, max_grid_size=4)
        assert recon.shape == (1, 3, 64, 64)
        np.testing.assert_array_equal(np.asarray(recon)[0, :, :32, :32], img)


# ---------------------------------------------------------------------------
# preprocess / postprocess
# ---------------------------------------------------------------------------


class TestIO:
    def test_preprocess_batches(self):
        d = preprocess([make_image(64, 64), make_image(48, 32)], device="cpu")
        assert d["patches"].shape[0] == 2
        assert d["patches"].shape[1] == 256
        assert bool(d["patch_mask"][0].sum()) and bool(d["patch_mask"][1].sum())

    def test_preprocess_postprocess_identity(self):
        img = make_image(64, 64, seed=9)
        d = preprocess(
            img,
            pp="to_tensor|normalize(minus_one_to_one)|patchify(16, 64)",
            device="cpu",
        )
        out = postprocess(dict(d), output_format="0_255", do_unpack=True)
        recon = np.asarray(out[0]).transpose(1, 2, 0)
        np.testing.assert_array_equal(recon, np.asarray(img))

    def test_format_conversions(self):
        x = jnp.array([[-1.0, 0.0, 1.0]])
        out = postprocess(x, output_format="zero_to_one")
        np.testing.assert_allclose(np.asarray(out), [[0.0, 0.5, 1.0]])
        out255 = postprocess(x, output_format="0_255")
        np.testing.assert_array_equal(np.asarray(out255), [[0, 128, 255]])

    def test_tensor_passthrough(self):
        x = jnp.zeros((1, 3, 8, 8))
        out = postprocess(x, output_format="minus_one_to_one")
        assert out.shape == (1, 3, 8, 8)


# ---------------------------------------------------------------------------
# sample_tiles
# ---------------------------------------------------------------------------


class TestSampleTiles:
    def test_shapes_and_determinism(self):
        import jax

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
        oh = jnp.array([64, 64])
        ow = jnp.array([64, 64])
        tiles, idx = sample_tiles(
            imgs, oh, ow, n_tiles=2, tile_size=(32, 32), rng=jax.random.key(0)
        )
        assert tiles.shape == (2, 2, 3, 32, 32)
        tiles2, _ = sample_tiles(imgs, oh, ow, n_tiles=2, tile_size=(32, 32), indices=idx)
        np.testing.assert_array_equal(np.asarray(tiles), np.asarray(tiles2))

    def test_small_image_padded(self):
        imgs = jnp.zeros((1, 3, 16, 16))
        tiles, _ = sample_tiles(
            imgs, jnp.array([16]), jnp.array([16]), n_tiles=1, tile_size=(32, 32)
        )
        assert tiles.shape == (1, 1, 3, 32, 32)
        # Padding value is -1 (background)
        assert float(tiles[0, 0, 0, -1, -1]) == -1.0
