"""Native C++ preprocessing extension vs the numpy reference path."""

import numpy as np
import pytest

import vitok_tpu.native as nat
from vitok_tpu.native import native_available, patchify_collate_batch


def _force(native: bool):
    import os

    nat._TRIED = False
    nat._EXT = None
    if native:
        os.environ.pop("VITOK_DISABLE_NATIVE", None)
    else:
        os.environ["VITOK_DISABLE_NATIVE"] = "1"


@pytest.fixture(autouse=True)
def _restore():
    yield
    _force(True)


def batch(seed=0, n=4):
    rng = np.random.default_rng(seed)
    sizes = [(3, 64, 64), (3, 50, 30), (3, 32, 96), (3, 17, 17)][:n]
    return [rng.random(s, dtype=np.float32) for s in sizes]


class TestNative:
    def test_fallback_always_works(self):
        _force(False)
        out = patchify_collate_batch(batch(), 16, 64)
        assert out["patches"].shape == (4, 64, 768)

    @pytest.mark.skipif(not native_available(), reason="extension not built")
    def test_native_matches_numpy(self):
        imgs = batch()
        _force(True)
        a = patchify_collate_batch(imgs, 16, 64)
        _force(False)
        b = patchify_collate_batch(imgs, 16, 64)
        for k in ("patches", "row_idx", "col_idx", "orig_height",
                  "orig_width", "grid_rows", "grid_cols"):
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32),
                np.asarray(b[k], np.float32),
                atol=1e-6, err_msg=k,
            )
        np.testing.assert_array_equal(a["patch_mask"], b["patch_mask"])

    @pytest.mark.skipif(not native_available(), reason="extension not built")
    def test_normalize_modes(self):
        imgs = batch(n=2)
        for mode in ("minus_one_to_one", "imagenet", "zero_to_one", None):
            _force(True)
            a = patchify_collate_batch(imgs, 16, 64, normalize=mode)
            _force(False)
            b = patchify_collate_batch(imgs, 16, 64, normalize=mode)
            np.testing.assert_allclose(
                a["patches"], b["patches"], atol=1e-5, err_msg=str(mode)
            )

    @pytest.mark.skipif(not native_available(), reason="extension not built")
    def test_over_budget_raises(self):
        _force(True)
        with pytest.raises(ValueError):
            patchify_collate_batch([np.zeros((3, 256, 256), np.float32)], 16, 16)
