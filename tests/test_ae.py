"""AE model tests: variant DSL, shapes, masking invariance, golden parity.

The parity tests instantiate the actual torch reference AE (sdpa backend,
CPU) as a numerical oracle, export its state dict, import it into our
stacked-pytree layout, and compare encode/decode outputs — the same pattern
as the reference's own ``tests/gpu/test_v2_comparison.py`` harness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.models import (
    AE,
    AEConfig,
    decode_variant,
    init_params,
    num_params,
)
from vitok_tpu.models.ae import encode_apply, decode_apply, forward_apply
from vitok_tpu.utils.params_io import (
    pytree_to_torch_state,
    torch_state_to_pytree,
)
from tests.reference_loader import load_reference_ae

try:
    import torch

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


def make_batch(b=2, n=64, patch=16, grid=(4, 4), seed=0, valid=None):
    """Synthetic NaFlex batch with a dense grid per sample."""
    rng = np.random.default_rng(seed)
    gr, gc = grid
    nv = gr * gc
    valid = nv if valid is None else valid
    d = {
        "patches": np.zeros((b, n, patch * patch * 3), np.float32),
        "patch_mask": np.zeros((b, n), bool),
        "row_idx": np.zeros((b, n), np.int32),
        "col_idx": np.zeros((b, n), np.int32),
        "orig_height": np.full((b,), gr * patch, np.int32),
        "orig_width": np.full((b,), gc * patch, np.int32),
    }
    yy, xx = np.meshgrid(np.arange(gr), np.arange(gc), indexing="ij")
    for i in range(b):
        d["patches"][i, :valid] = rng.standard_normal(
            (valid, patch * patch * 3)
        ).astype(np.float32)
        d["patch_mask"][i, :valid] = True
        d["row_idx"][i, :nv] = yy.ravel()
        d["col_idx"][i, :nv] = xx.ravel()
    return {k: jnp.asarray(v) for k, v in d.items()}


TINY = dict(
    encoder_width=64,
    decoder_width=64,
    encoder_depth=2,
    decoder_depth=2,
    encoder_heads=2,
    decoder_heads=2,
    channels_per_token=8,
    pixels_per_token=768,
    attn_impl="xla",
)


class TestVariantDSL:
    def test_base_variants(self):
        cfg = decode_variant("B/1x16x64")
        assert cfg["encoder_width"] == 768 and cfg["encoder_depth"] == 12
        assert cfg["pixels_per_token"] == 768
        assert cfg["channels_per_token"] == 64

    def test_asymmetric(self):
        cfg = decode_variant("Ld4-Ld24/1x16x64")
        assert cfg["encoder_depth"] == 4 and cfg["decoder_depth"] == 24
        assert cfg["encoder_width"] == cfg["decoder_width"] == 1024
        assert cfg["encoder_heads"] == cfg["decoder_heads"] == 16

    def test_5b_variant(self):
        cfg = decode_variant("Td4-T/1x16x64")
        assert cfg["encoder_width"] == 3072 and cfg["decoder_depth"] == 40
        assert cfg["decoder_heads"] == 24

    def test_two_part_geometry(self):
        cfg = decode_variant("B/16x64")
        assert cfg["temporal_stride"] == 1
        assert cfg["spatial_stride"] == 16

    def test_custom_underscore(self):
        cfg = decode_variant("w512_d8_h8-w256_d4_h4/1x8x16")
        assert cfg["encoder_width"] == 512 and cfg["decoder_width"] == 256
        assert cfg["pixels_per_token"] == 8 * 8 * 3

    def test_modifiers(self):
        cfg = decode_variant("Bw512/1x16x16")
        assert cfg["encoder_width"] == 512 and cfg["encoder_depth"] == 12

    def test_unknown_base_raises(self):
        with pytest.raises(ValueError):
            decode_variant("Z/1x16x64")

    def test_invalid_geometry_raises(self):
        with pytest.raises(ValueError):
            decode_variant("B/1x2x3x4")

    def test_mlp_factor_max(self):
        cfg = decode_variant("Bm4-Bm2/1x16x16")
        assert cfg["mlp_factor"] == 4.0


class TestParamCounts:
    def test_350m_family(self):
        """Reference: 51M encoder + 303M decoder for Ld4-Ld24 (README.md:86)."""
        cfg = AEConfig.from_variant("Ld4-Ld24/1x16x64")
        p = init_params(cfg, jax.random.key(0))
        enc = sum(
            x.size
            for k in ("patch_embed", "encoder_blocks", "to_code")
            for x in jax.tree_util.tree_leaves(p[k])
        )
        dec = sum(
            x.size
            for k in ("decoder_embed", "decoder_blocks", "to_pixels")
            for x in jax.tree_util.tree_leaves(p[k])
        )
        assert abs(enc / 1e6 - 51) < 2, enc / 1e6
        assert abs(dec / 1e6 - 303) < 5, dec / 1e6

    def test_encoder_only(self):
        cfg = AEConfig(**TINY, decoder=False)
        p = init_params(cfg, jax.random.key(0))
        assert "decoder_blocks" not in p and "encoder_blocks" in p


class TestForward:
    def test_encode_shapes(self):
        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch()
        out = encode_apply(p, batch, cfg)
        assert out["z"].shape == (2, 64, 8)
        assert not bool(jnp.isnan(out["z"]).any())

    def test_roundtrip_shapes(self):
        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch()
        out = forward_apply(p, batch, cfg)
        assert out["patches"].shape == batch["patches"].shape
        assert not bool(jnp.isnan(out["patches"]).any())

    def test_mask_invariance(self):
        """Padding tokens must not influence valid-token outputs."""
        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1, n=64, valid=9, grid=(3, 3))
        out1 = encode_apply(p, batch, cfg, compute_dtype=jnp.float32)
        # Corrupt padded patch pixels — valid z must be unchanged.
        patches2 = batch["patches"].at[:, 9:].set(123.0)
        batch2 = dict(batch, patches=patches2)
        out2 = encode_apply(p, batch2, cfg, compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out1["z"][:, :9]), np.asarray(out2["z"][:, :9]), atol=1e-5
        )

    def test_object_api(self):
        model = AE(**decode_variant("w64_d2_h2-w64_d2_h2/1x16x8"), attn_impl="xla")
        assert model.is_encoder and model.is_decoder
        batch = make_batch()
        out = model(batch)
        assert out["patches"].shape == batch["patches"].shape
        z = model.encode(batch)
        rec = model.decode(z)
        assert rec["patches"].shape == batch["patches"].shape

    def test_unknown_kwargs_swallowed(self):
        # Reference AE(**kwargs) swallows e.g. variational/float8_mode.
        model = AE(**TINY, variational=True, float8_mode="x")
        assert model.cfg.encoder_width == 64

    def test_sliding_window_changes_output(self):
        cfg = AEConfig(**TINY)
        cfg_sw = AEConfig(**{**TINY, "sw": 2})
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1, n=64)
        full = encode_apply(p, batch, cfg, compute_dtype=jnp.float32)
        sw = encode_apply(p, batch, cfg_sw, compute_dtype=jnp.float32)
        assert np.abs(np.asarray(full["z"]) - np.asarray(sw["z"])).max() > 1e-4

    def test_sw_nonpositive_disabled(self):
        cfg = AEConfig(**{**TINY, "sw": 0})
        assert cfg.sw is None

    @pytest.mark.parametrize("k", [1, 2, -1, -2])
    def test_grad_checkpoint_same_output(self, k):
        cfg = AEConfig(**TINY)
        cfg_ckpt = AEConfig(**{**TINY, "checkpoint": k})
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1)
        a = forward_apply(p, batch, cfg, compute_dtype=jnp.float32)
        b = forward_apply(p, batch, cfg_ckpt, compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(a["patches"]), np.asarray(b["patches"]), atol=1e-6
        )

    @pytest.mark.parametrize("k", [1, 2, -1, -2])
    def test_grad_checkpoint_same_grads(self, k):
        """Remat must not change gradients (every-k-th / unrolled paths)."""
        cfg = AEConfig(**TINY)
        cfg_ckpt = AEConfig(**{**TINY, "checkpoint": k})
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1)

        def loss(pp, c):
            out = forward_apply(pp, batch, c, compute_dtype=jnp.float32)
            return jnp.mean(out["patches"].astype(jnp.float32) ** 2)

        g_ref = jax.grad(lambda pp: loss(pp, cfg))(p)
        g_ck = jax.grad(lambda pp: loss(pp, cfg_ckpt))(p)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_ck)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    @pytest.mark.parametrize(
        "save",
        [
            ("qkv_out",),
            ("qkv_out", "ffn_hid"),
            ("qkv_out", "ffn_hid", "attn_out"),
            ("qkv_out", "ffn_hid", "attn_out", "h_norm", "q_rot", "k_rot"),
        ],
    )
    def test_remat_save_policy_same_grads(self, save):
        """save_only_these_names remat must not change outputs or grads."""
        self._check_policy_grads(save, checkpoint=1)

    def test_unrolled_remat_save_policy_same_grads(self):
        """The unrolled per-layer remat honors the same save policy."""
        self._check_policy_grads(
            ("qkv_out", "ffn_hid", "attn_out"), checkpoint=-1
        )

    def _check_policy_grads(self, save, checkpoint):
        cfg = AEConfig(**TINY)
        cfg_pol = AEConfig(
            **{**TINY, "checkpoint": checkpoint, "remat_save": save}
        )
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1)

        def loss(pp, c):
            out = forward_apply(pp, batch, c, compute_dtype=jnp.float32)
            return jnp.mean(out["patches"].astype(jnp.float32) ** 2)

        np.testing.assert_allclose(
            np.asarray(loss(p, cfg)), np.asarray(loss(p, cfg_pol)), atol=1e-6
        )
        g_ref = jax.grad(lambda pp: loss(pp, cfg))(p)
        g_pol = jax.grad(lambda pp: loss(pp, cfg_pol))(p)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pol)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_grad_checkpoint_nondivisible_depth(self):
        """depth % k != 0 keeps every-k-th granularity (trailing short group)."""
        base = {**TINY, "encoder_depth": 3, "decoder_depth": 5}
        cfg = AEConfig(**base)
        cfg_ckpt = AEConfig(**{**base, "checkpoint": 2})
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=1)

        def loss(pp, c):
            out = forward_apply(pp, batch, c, compute_dtype=jnp.float32)
            return jnp.mean(out["patches"].astype(jnp.float32) ** 2)

        np.testing.assert_allclose(
            np.asarray(loss(p, cfg)), np.asarray(loss(p, cfg_ckpt)), atol=1e-6
        )
        g_ref = jax.grad(lambda pp: loss(pp, cfg))(p)
        g_ck = jax.grad(lambda pp: loss(pp, cfg_ckpt))(p)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_ck)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_drop_path_train_only(self):
        cfg = AEConfig(**{**TINY, "drop_path_rate": 0.9})
        p = init_params(cfg, jax.random.key(0))
        batch = make_batch(b=4)
        det = forward_apply(p, batch, cfg, compute_dtype=jnp.float32)
        trn = forward_apply(
            p, batch, cfg,
            deterministic=False, rng=jax.random.key(1), compute_dtype=jnp.float32,
        )
        # Deterministic path is stable; train path differs due to dropped paths.
        det2 = forward_apply(p, batch, cfg, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(det["patches"]), np.asarray(det2["patches"])
        )
        assert np.abs(
            np.asarray(det["patches"]) - np.asarray(trn["patches"])
        ).max() > 1e-5


# ---------------------------------------------------------------------------
# Checkpoint interchange
# ---------------------------------------------------------------------------


class TestMetaContract:
    """Model outputs carry the full reference patch-dict metadata.

    The reference passes time_idx/grid_rows/grid_cols through encode and
    decode outputs (vitok/models/ae.py:209-216,236-243); dropping them
    silently changes the dict contract and knocks ``postprocess`` off the
    dense reshape fast path.
    """

    META = {
        "patch_mask",
        "row_idx",
        "col_idx",
        "time_idx",
        "orig_height",
        "orig_width",
        "grid_rows",
        "grid_cols",
    }

    def _pp_batch(self):
        from vitok_tpu.pp.io import preprocess

        img = np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), dtype=np.uint8
        )
        return preprocess(
            [img, img],
            pp="to_tensor|normalize(minus_one_to_one)|patchify(16, 64)",
        )

    def test_encode_decode_keys(self):
        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        batch = self._pp_batch()
        assert self.META <= set(batch)
        enc = encode_apply(params, batch, cfg, compute_dtype=jnp.float32)
        assert self.META <= set(enc), sorted(self.META - set(enc))
        dec = decode_apply(params, enc, cfg, compute_dtype=jnp.float32)
        assert self.META <= set(dec), sorted(self.META - set(dec))

    def test_postprocess_keeps_dense_fast_path(self, monkeypatch):
        from vitok_tpu.pp import ops as pp_ops
        from vitok_tpu.pp.io import postprocess

        cfg = AEConfig(**TINY)
        params = init_params(cfg, jax.random.key(0))
        dec = forward_apply(
            params, self._pp_batch(), cfg, compute_dtype=jnp.float32
        )
        calls = []
        dense = pp_ops._unpatchify_dense
        monkeypatch.setattr(
            pp_ops,
            "_unpatchify_dense",
            lambda *a, **k: calls.append(1) or dense(*a, **k),
        )
        imgs = postprocess(dec, output_format="0_255", do_unpack=True)
        assert calls, "postprocess(model output) fell off the dense fast path"
        assert imgs[0].shape == (3, 64, 64)


class TestParamsIO:
    def test_roundtrip(self):
        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        state = pytree_to_torch_state(p)
        assert "encoder_blocks.0.attn.qkv_proj.weight" in state
        assert "patch_embed.weight" in state
        p2 = torch_state_to_pytree(state, cfg)
        key = lambda kv: str(kv[0])
        for (k1, a), (k2, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(p2), key=key),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_depth_mismatch_raises(self):
        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        state = pytree_to_torch_state(p)
        bad_cfg = AEConfig(**{**TINY, "encoder_depth": 3})
        with pytest.raises(ValueError):
            torch_state_to_pytree(state, bad_cfg)

    def test_safetensors_roundtrip(self, tmp_path):
        pytest.importorskip("safetensors")
        from vitok_tpu.utils.params_io import (
            load_safetensors_params,
            save_safetensors_params,
        )

        cfg = AEConfig(**TINY)
        p = init_params(cfg, jax.random.key(0))
        enc_path = str(tmp_path / "encoder.safetensors")
        dec_path = str(tmp_path / "decoder.safetensors")
        save_safetensors_params(p, enc_path, component="encoder")
        save_safetensors_params(p, dec_path, component="decoder")
        p2 = load_safetensors_params({"encoder": enc_path, "decoder": dec_path}, cfg)
        assert "encoder_blocks" in p2 and "decoder_blocks" in p2


# ---------------------------------------------------------------------------
# Golden parity vs the torch reference
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
class TestReferenceParity:
    @pytest.fixture(scope="class")
    def ref(self):
        mod = load_reference_ae()
        if mod is None:
            pytest.skip("reference not importable")
        return mod

    def _build_pair(self, ref, variant, **kw):
        torch.manual_seed(0)
        ref_model = ref.AE(**ref.decode_variant(variant), attn_backend="sdpa", **kw)
        ref_model.eval()
        cfg = AEConfig.from_variant(variant, attn_impl="xla", **kw)
        params = torch_state_to_pytree(ref_model.state_dict(), cfg)
        return ref_model, cfg, params

    def _np_batch(self, batch):
        return {
            k: torch.tensor(np.asarray(v))
            for k, v in batch.items()
        }

    def test_encode_decode_parity(self, ref):
        variant = "w64_d2_h2-w64_d3_h2/1x16x8"
        ref_model, cfg, params = self._build_pair(ref, variant)
        batch = make_batch(b=2, n=32, grid=(4, 4), valid=16)
        tb = self._np_batch(batch)
        tb["patch_mask"] = tb["patch_mask"].bool()
        with torch.no_grad():
            ref_enc = ref_model.encode(tb)
            ref_out = ref_model.decode(ref_enc)

        enc = encode_apply(params, batch, cfg, compute_dtype=jnp.float32)
        out = decode_apply(params, enc, cfg, compute_dtype=jnp.float32)

        z_ref = ref_enc["z"].numpy()
        z_ours = np.asarray(enc["z"])
        mask = np.asarray(batch["patch_mask"])
        # Compare only valid tokens (we mask attention, reference sdpa does too)
        assert np.abs(z_ours[mask] - z_ref[mask]).max() < 1e-4
        p_ref = ref_out["patches"].numpy()
        p_ours = np.asarray(out["patches"])
        assert np.abs(p_ours[mask] - p_ref[mask]).max() < 1e-4

    def test_full_grid_forward_parity(self, ref):
        """Full batches (no padding) — forward() vs forward_apply."""
        variant = "w64_d2_h2/1x16x8"
        ref_model, cfg, params = self._build_pair(ref, variant)
        batch = make_batch(b=2, n=16, grid=(4, 4))
        tb = self._np_batch(batch)
        tb["patch_mask"] = tb["patch_mask"].bool()
        with torch.no_grad():
            ref_out = ref_model(tb)
        out = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)
        diff = np.abs(np.asarray(out["patches"]) - ref_out["patches"].numpy())
        assert diff.max() < 1e-4, diff.max()

    def test_rectangular_grid_parity(self, ref):
        """Non-square NaFlex grid exercises 2D RoPE row/col split."""
        variant = "w64_d2_h2/1x16x8"
        ref_model, cfg, params = self._build_pair(ref, variant)
        batch = make_batch(b=1, n=32, grid=(2, 8), valid=16)
        tb = self._np_batch(batch)
        tb["patch_mask"] = tb["patch_mask"].bool()
        with torch.no_grad():
            ref_out = ref_model(tb)
        out = forward_apply(params, batch, cfg, compute_dtype=jnp.float32)
        mask = np.asarray(batch["patch_mask"])
        diff = np.abs(
            np.asarray(out["patches"])[mask] - ref_out["patches"].numpy()[mask]
        )
        assert diff.max() < 1e-4, diff.max()
