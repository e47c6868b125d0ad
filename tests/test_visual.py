"""Visual dump tests: labeled images through the full pipeline for human
inspection (reference tests/visual/test_pp_visual.py pattern).

Writes PNGs to ``tests/test_outputs/`` — gradients, checkerboards, shapes —
after preprocess -> (optional AE) -> unpatchify -> postprocess, and asserts
exact reconstruction for the identity path.
"""

import os

import numpy as np
import pytest
from PIL import Image, ImageDraw

from vitok_tpu import AE, decode_variant, postprocess, preprocess

OUT_DIR = os.path.join(os.path.dirname(__file__), "test_outputs")


def make_test_image(kind: str, w=320, h=200) -> Image.Image:
    arr = np.zeros((h, w, 3), np.uint8)
    if kind == "gradient":
        arr[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        arr[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        arr[..., 2] = 128
    elif kind == "checker":
        yy, xx = np.mgrid[0:h, 0:w]
        arr[((yy // 16 + xx // 16) % 2).astype(bool)] = 255
    img = Image.fromarray(arr)
    d = ImageDraw.Draw(img)
    d.ellipse([w // 4, h // 4, 3 * w // 4, 3 * h // 4], outline=(255, 0, 0), width=3)
    d.text((8, 8), kind, fill=(0, 255, 0))
    return img


def save(arr_chw: np.ndarray, name: str):
    os.makedirs(OUT_DIR, exist_ok=True)
    img = np.asarray(arr_chw).transpose(1, 2, 0).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(OUT_DIR, name))


@pytest.mark.parametrize("kind", ["gradient", "checker"])
def test_identity_pipeline_visual(kind):
    img = make_test_image(kind)
    d = preprocess(
        img, pp="to_tensor|normalize(minus_one_to_one)|patchify(16, 260)",
        device="cpu",
    )
    out = postprocess(dict(d), output_format="0_255", do_unpack=True)
    recon = np.asarray(out[0])
    save(recon, f"identity_{kind}.png")
    np.testing.assert_array_equal(
        recon.transpose(1, 2, 0), np.asarray(img)
    )


def test_random_ae_recon_visual():
    """Random-weight AE reconstruction dumped for qualitative inspection."""
    img = make_test_image("gradient", 128, 96)
    model = AE(
        **decode_variant("w64_d2_h2-w64_d2_h2/1x16x8"), attn_impl="xla"
    )
    d = preprocess(
        img, pp="to_tensor|normalize(minus_one_to_one)|patchify(16, 48)",
        device="cpu",
    )
    out = model(d)
    recon = postprocess(dict(out), output_format="0_255", do_unpack=True)
    save(np.asarray(recon[0]), "ae_random_recon.png")
    assert recon[0].shape == (3, 96, 128)
