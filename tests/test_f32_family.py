"""f32 variant family coverage: patch-32 (spatial_stride=32) geometry.

The released registry carries three f32 checkpoints (``5B-f32x{64,128,256}``,
variants ``Td4-T/1x32x*`` — reference ``vitok/pretrained.py:7-20``), and the
reference's fastest published config is 5B-f32x256 @256p = 64 tokens
(docs/index.html:522-533). Until round 4 no test exercised ``1x32x*``
geometry at all, so a stride-32 bug in patchify, the RoPE grid, or the
params interchange would have been invisible. This suite drives the whole
path at patch 32: pp roundtrip, variant DSL, torch-oracle encode/decode
parity at a reduced-width ``1x32x64`` config, params_io roundtrip, and the
preprocess -> AE -> postprocess pipeline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.models import AEConfig, decode_variant, init_params
from vitok_tpu.models.ae import decode_apply, encode_apply, forward_apply
from vitok_tpu.pp.io import patch_collate_fn, postprocess, preprocess
from vitok_tpu.pp.ops import patchify_array, unpatchify
from vitok_tpu.utils.params_io import (
    pytree_to_torch_state,
    torch_state_to_pytree,
)
from tests.reference_loader import load_reference_ae
from tests.test_ae import make_batch

try:
    import torch

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False

F32_TINY = "w64_d2_h2-w64_d3_h2/1x32x64"


class TestF32VariantDSL:
    def test_registry_f32_variants_parse(self):
        from vitok_tpu.pretrained import get_pretrained_info, list_pretrained

        f32 = [m for m in list_pretrained() if "f32" in m]
        assert {"5B-f32x64", "5B-f32x128", "5B-f32x256"} <= set(f32)
        for name in f32:
            _, _, variant = get_pretrained_info(name)
            cfg = decode_variant(variant)
            assert cfg["spatial_stride"] == 32
            assert cfg["pixels_per_token"] == 32 * 32 * 3  # 3072
            assert cfg["encoder_width"] == 3072  # Td4-T

    def test_f32_geometry(self):
        cfg = AEConfig.from_variant("Td4-T/1x32x256")
        assert cfg.spatial_stride == 32
        assert cfg.pixels_per_token == 3072
        assert cfg.channels_per_token == 256

    def test_f32_param_shapes(self):
        cfg = AEConfig.from_variant(F32_TINY)
        p = init_params(cfg, jax.random.key(0))
        assert p["patch_embed"]["kernel"].shape == (3072, 64)
        assert p["to_pixels"]["kernel"].shape == (64, 3072)
        assert p["to_code"]["kernel"].shape == (64, 64)


class TestF32Patchify:
    def test_roundtrip_bit_exact(self):
        """patchify(32) -> unpatchify(32) is bit-exact (the pp correctness
        anchor, at the f32 stride)."""
        rng = np.random.default_rng(0)
        img = rng.standard_normal((3, 96, 160)).astype(np.float32)
        d = patchify_array(img, 32, 64)
        assert d["patches"].shape == (64, 3 * 32 * 32)
        assert int(d["patch_mask"].sum()) == 3 * 5
        recon = unpatchify(patch_collate_fn([d]), patch=32)
        np.testing.assert_array_equal(
            np.asarray(recon[0, :, :96, :160]), img
        )

    def test_non_multiple_sizes_pad_then_crop(self):
        rng = np.random.default_rng(1)
        img = rng.standard_normal((3, 70, 45)).astype(np.float32)
        d = patchify_array(img, 32, 16)
        assert int(d["patch_mask"].sum()) == 3 * 2  # ceil(70/32) x ceil(45/32)
        batched = patch_collate_fn([d])
        recon = unpatchify(batched, patch=32)
        np.testing.assert_array_equal(np.asarray(recon[0, :, :70, :45]), img)
        # padding region is exact zeros (NaFlex zero-pad contract)
        assert np.all(np.asarray(recon[0, :, 70:, :]) == 0)

    def test_mixed_batch_roundtrip(self):
        rng = np.random.default_rng(2)
        imgs = [
            rng.standard_normal((3, 64, 64)).astype(np.float32),
            rng.standard_normal((3, 128, 96)).astype(np.float32),
        ]
        ds = [patchify_array(i, 32, 16) for i in imgs]
        recon = unpatchify(patch_collate_fn(ds), patch=32)
        for i, img in enumerate(imgs):
            c, h, w = img.shape
            np.testing.assert_array_equal(
                np.asarray(recon[i, :, :h, :w]), img
            )

    def test_tokens_quarter_of_f16(self):
        """f32 quarters the token count vs f16 at the same resolution
        (README.md:105-113 — the family's reason to exist)."""
        img = np.zeros((3, 256, 256), np.float32)
        d16 = patchify_array(img, 16, 1024)
        d32 = patchify_array(img, 32, 1024)
        assert int(d16["patch_mask"].sum()) == 256
        assert int(d32["patch_mask"].sum()) == 64


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
class TestF32ReferenceParity:
    @pytest.fixture(scope="class")
    def ref(self):
        mod = load_reference_ae()
        if mod is None:
            pytest.skip("reference not importable")
        return mod

    def test_encode_decode_parity_patch32(self, ref):
        """torch-oracle parity at 1x32x64 geometry (reduced width)."""
        torch.manual_seed(0)
        ref_model = ref.AE(
            **ref.decode_variant(F32_TINY), attn_backend="sdpa"
        ).eval()
        cfg = AEConfig.from_variant(F32_TINY, attn_impl="xla")
        params = torch_state_to_pytree(ref_model.state_dict(), cfg)

        batch = make_batch(b=2, n=32, patch=32, grid=(4, 4), valid=16)
        tb = {k: torch.tensor(np.asarray(v)) for k, v in batch.items()}
        tb["patch_mask"] = tb["patch_mask"].bool()
        with torch.no_grad():
            ref_enc = ref_model.encode(tb)
            ref_out = ref_model.decode(ref_enc)
        enc = encode_apply(params, batch, cfg, compute_dtype=jnp.float32)
        out = decode_apply(params, enc, cfg, compute_dtype=jnp.float32)
        mask = np.asarray(batch["patch_mask"])
        z_diff = np.abs(
            np.asarray(enc["z"])[mask] - ref_enc["z"].numpy()[mask]
        ).max()
        p_diff = np.abs(
            np.asarray(out["patches"])[mask] - ref_out["patches"].numpy()[mask]
        ).max()
        assert z_diff < 1e-4, f"latent diff {z_diff}"
        assert p_diff < 1e-4, f"patch diff {p_diff}"

    def test_params_io_roundtrip_patch32(self, ref):
        cfg = AEConfig.from_variant(F32_TINY)
        p = init_params(cfg, jax.random.key(3))
        state = pytree_to_torch_state(p)
        assert state["patch_embed.weight"].shape == (64, 3072)
        assert state["to_pixels.weight"].shape == (3072, 64)
        p2 = torch_state_to_pytree(state, cfg)
        key = lambda kv: str(kv[0])
        for (k1, a), (k2, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(p2), key=key),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7, err_msg=str(k1)
            )


class TestF32Pipeline:
    def test_preprocess_forward_postprocess(self):
        """Full pipeline at patch 32: original-size crop-back."""
        cfg = AEConfig.from_variant(F32_TINY, attn_impl="xla")
        params = init_params(cfg, jax.random.key(0))
        img = np.random.default_rng(0).integers(
            0, 255, (200, 320, 3), dtype=np.uint8
        )
        batch = preprocess(
            img, pp="to_tensor|normalize(minus_one_to_one)|patchify(32, 70)"
        )
        assert batch["patches"].shape[-1] == 3072
        out = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)
        recon = postprocess(
            out, output_format="minus_one_to_one", do_unpack=True, patch=32
        )
        assert recon[0].shape == (3, 200, 320)
        assert np.isfinite(np.asarray(recon[0])).all()

    def test_identity_postprocess_patch32(self):
        """postprocess of the INPUT patches at stride 32 is bit-exact."""
        img = np.random.default_rng(1).integers(
            0, 255, (96, 160, 3), dtype=np.uint8
        )
        batch = preprocess(
            img, pp="to_tensor|normalize(minus_one_to_one)|patchify(32, 15)"
        )
        ident = postprocess(
            dict(batch), output_format="0_255", do_unpack=True, patch=32
        )
        np.testing.assert_array_equal(
            np.asarray(ident[0]).transpose(1, 2, 0), img
        )

    def test_rope_grid_row_col_split_patch32(self):
        """Rectangular stride-32 grid: RoPE indices drive the output (a
        transposed grid must decode differently on valid tokens).
        gamma = O(1): the reference LayerScale init 1e-4 attenuates the
        block outputs (and so the RoPE sensitivity) below the threshold."""
        cfg = AEConfig.from_variant(
            F32_TINY, attn_impl="xla", layer_scale_init=1.0
        )
        params = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1, n=16, patch=32, grid=(2, 8))
        out_a = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)
        swapped = dict(
            batch, row_idx=batch["col_idx"], col_idx=batch["row_idx"]
        )
        out_b = forward_apply(params, swapped, cfg, compute_dtype=jnp.float32)
        assert (
            np.abs(
                np.asarray(out_a["patches"]) - np.asarray(out_b["patches"])
            ).max()
            > 1e-4
        )
