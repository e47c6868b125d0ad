"""DINO ViT feature backbone: torch-oracle parity, interpolation, grads.

The oracle is a minimal torch ViT built here with timm/DINO flat naming —
the same interchange layout real DINO checkpoints use — so the test
validates both the forward math and the state-dict mapping at once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.models.vit_features import (
    ViTCfg,
    init_vit_params,
    interpolate_pos_embed,
    make_dino_feature_fn,
    torch_vit_state_to_pytree,
    vit_apply,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

TINY = ViTCfg(width=64, depth=2, heads=2, patch=16, img_size=64, attn_impl="xla")


class TorchBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(a)
        h = self.mlp.fc1(self.norm2(x))
        h = torch.nn.functional.gelu(h)
        return x + self.mlp.fc2(h)


class TorchViT(nn.Module):
    """timm-named ViT oracle (DINO checkpoint layout)."""

    def __init__(self, cfg: ViTCfg):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(
            3, cfg.width, cfg.patch, stride=cfg.patch
        )
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.width) * 0.02)
        n = cfg.grid * cfg.grid
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + n, cfg.width) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(cfg.width, cfg.heads) for _ in range(cfg.depth)]
        )
        self.norm = nn.LayerNorm(cfg.width, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class TestTorchParity:
    def test_forward_matches_oracle(self):
        torch.manual_seed(0)
        oracle = TorchViT(TINY).eval()
        params = torch_vit_state_to_pytree(oracle.state_dict(), TINY)
        x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = oracle(torch.tensor(x)).numpy()
        got = np.asarray(vit_apply(params, jnp.asarray(x), TINY))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)

    def test_scan_stacked_shapes(self):
        params = init_vit_params(TINY, jax.random.key(0))
        assert params["blocks"]["qkv"]["kernel"].shape == (2, 64, 192)
        out = vit_apply(
            params,
            jnp.zeros((1, 3, 64, 64), jnp.float32),
            TINY,
        )
        assert out.shape == (1, 1 + 16, 64)


class TestInterpolation:
    def test_pos_embed_resize(self):
        pe = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 1 + 16, 8)),
            jnp.float32,
        )
        out = interpolate_pos_embed(pe, 4, (8, 6))
        assert out.shape == (1, 1 + 48, 8)
        np.testing.assert_array_equal(
            np.asarray(out[:, 0]), np.asarray(pe[:, 0])
        )  # cls slot untouched
        same = interpolate_pos_embed(pe, 4, (4, 4))
        np.testing.assert_array_equal(np.asarray(same), np.asarray(pe))

    def test_forward_other_resolution(self):
        params = init_vit_params(TINY, jax.random.key(0))
        out = vit_apply(params, jnp.zeros((1, 3, 96, 128), jnp.float32), TINY)
        assert out.shape == (1, 1 + 6 * 8, 64)


class TestFeatureFn:
    def test_grad_flows_and_resize(self):
        params = init_vit_params(TINY, jax.random.key(0))
        fn = make_dino_feature_fn(params, TINY, target_size=64)

        def loss(img):
            f = fn(img)
            return jnp.mean(f**2)

        img = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (1, 3, 32, 32)),
            jnp.float32,
        )
        g = jax.grad(loss)(img)
        assert g.shape == img.shape
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
