"""Data pipeline tests: tar shards, image folders, collate, labels.

Mirrors the reference's ``tests/cpu/test_data.py`` strategy: build real tar
shards with ``.cls`` labels in tmp_path, then iterate the loader.
"""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from vitok_tpu.data import (
    brace_expand,
    create_dataloader,
    iter_tar_samples,
    resolve_source,
    to_rgb,
)

PP = "to_tensor|normalize(minus_one_to_one)|resize_to_token_budget(16, 64)|patchify(16, 64)"


def make_tar(path, n_images=8, size=(48, 32), with_labels=True, seed=0):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n_images):
            img = Image.fromarray(
                rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"sample{i:04d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            if with_labels:
                label = str(i % 3).encode()
                info = tarfile.TarInfo(name=f"sample{i:04d}.cls")
                info.size = len(label)
                tf.addfile(info, io.BytesIO(label))
    return path


class TestTar:
    def test_iter_tar_samples(self, tmp_path):
        p = make_tar(str(tmp_path / "a.tar"))
        samples = list(iter_tar_samples(p))
        assert len(samples) == 8
        assert "jpg" in samples[0] and "cls" in samples[0]

    def test_loader_over_tar(self, tmp_path):
        p = make_tar(str(tmp_path / "a.tar"))
        loader = create_dataloader(p, PP, batch_size=4, return_labels=True)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["patches"].shape == (4, 64, 768)
        assert b["patch_mask"].any()
        assert set(np.unique(b["labels"])) <= {0, 1, 2}

    def test_partial_batches(self, tmp_path):
        p = make_tar(str(tmp_path / "a.tar"), n_images=5)
        full = list(create_dataloader(p, PP, batch_size=4))
        assert len(full) == 1  # partial dropped
        withp = list(create_dataloader(p, PP, batch_size=4, partial=True))
        assert len(withp) == 2 and withp[1]["patches"].shape[0] == 1

    def test_multi_source_and_rank_striding(self, tmp_path):
        p1 = make_tar(str(tmp_path / "a.tar"), n_images=4, seed=1)
        p2 = make_tar(str(tmp_path / "b.tar"), n_images=4, seed=2)
        src = f"{p1},{p2}"
        urls0 = resolve_source(src, rank=0, world=2, seed=0)
        urls1 = resolve_source(src, rank=1, world=2, seed=0)
        assert len(urls0) == 1 and len(urls1) == 1
        assert set(urls0 + urls1) == {p1, p2}

    def test_corrupt_member_skipped(self, tmp_path):
        p = str(tmp_path / "bad.tar")
        with tarfile.open(p, "w") as tf:
            garbage = b"not an image"
            info = tarfile.TarInfo(name="x0.jpg")
            info.size = len(garbage)
            tf.addfile(info, io.BytesIO(garbage))
        make_tar(str(tmp_path / "good.tar"), n_images=4)
        loader = create_dataloader(
            f"{p},{tmp_path}/good.tar", PP, batch_size=4
        )
        batches = list(loader)
        assert len(batches) == 1  # corrupt sample silently skipped

    def test_num_samples_cap(self, tmp_path):
        p = make_tar(str(tmp_path / "a.tar"), n_images=8)
        loader = create_dataloader(p, PP, batch_size=2, num_samples=4)
        assert len(list(loader)) == 2


class TestImageFolder:
    def test_folder_loader(self, tmp_path):
        rng = np.random.default_rng(0)
        sub = tmp_path / "imgs" / "classA"
        sub.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
            ).save(sub / f"{i}.png")
        loader = create_dataloader(str(tmp_path / "imgs"), PP, batch_size=3)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["patches"].shape[0] == 3

    def test_rank_split_disjoint(self, tmp_path):
        rng = np.random.default_rng(0)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
        n0 = sum(
            b["patches"].shape[0]
            for b in create_dataloader(str(d), PP, batch_size=1, rank=0, world=2)
        )
        n1 = sum(
            b["patches"].shape[0]
            for b in create_dataloader(str(d), PP, batch_size=1, rank=1, world=2)
        )
        assert n0 == 4 and n1 == 4


class TestHelpers:
    def test_brace_expand(self):
        urls = brace_expand("shard-{0000..0003}.tar")
        assert urls == [f"shard-{i:04d}.tar" for i in range(4)]
        assert brace_expand("plain.tar") == ["plain.tar"]

    def test_to_rgb_modes(self):
        rgba = Image.new("RGBA", (8, 8), (255, 0, 0, 128))
        out = to_rgb(rgba)
        assert out.mode == "RGB"
        gray = Image.new("L", (8, 8), 128)
        assert to_rgb(gray).mode == "RGB"

    def test_hf_url_resolution(self):
        urls = resolve_source("hf://org/repo/data-{0000..0001}.tar")
        assert len(urls) == 2
        assert all(u.startswith("pipe:curl") for u in urls)
        assert any("data-0000.tar" in u for u in urls)


class TestFusedNativePath:
    def test_fused_tail_matches_python_path(self, tmp_path):
        """Canonical pp tail routes through the fused native batcher and
        must produce the same batches as the pure-python path."""
        import vitok_tpu.data.loaders as L

        p = make_tar(str(tmp_path / "a.tar"), n_images=4, size=(48, 48))
        pp_fused = "to_tensor|normalize(minus_one_to_one)|patchify(16, 16)"
        assert L._split_fused_tail(pp_fused) is not None
        # budget-resize before patchify must NOT take the fused path
        assert L._split_fused_tail(
            "to_tensor|normalize(minus_one_to_one)|"
            "resize_to_token_budget(16, 16)|patchify(16, 16)"
        ) is None

        a = list(create_dataloader(p, pp_fused, batch_size=4, seed=1))
        import os

        os.environ["VITOK_DISABLE_NATIVE"] = "1"
        import vitok_tpu.native as nat

        nat._TRIED = False
        nat._EXT = None
        try:
            b = list(create_dataloader(p, pp_fused, batch_size=4, seed=1))
        finally:
            os.environ.pop("VITOK_DISABLE_NATIVE")
            nat._TRIED = False
            nat._EXT = None
        assert len(a) == len(b) == 1
        np.testing.assert_allclose(
            a[0]["patches"], b[0]["patches"], atol=1e-5
        )
        np.testing.assert_array_equal(a[0]["patch_mask"], b[0]["patch_mask"])


class TestLoaderRobustness:
    def test_abandoned_iterator_stops_producer(self, tmp_path):
        """Breaking out of iteration must release the producer thread."""
        import threading
        import time as _time

        p = make_tar(str(tmp_path / "a.tar"), n_images=8)
        before = threading.active_count()
        loader = create_dataloader(p, PP, batch_size=2, repeat=True)
        it = iter(loader)
        next(it)
        it.close()  # abandon
        deadline = _time.time() + 5
        while threading.active_count() > before and _time.time() < deadline:
            _time.sleep(0.05)
        assert threading.active_count() <= before

    def test_fused_path_skips_oversized(self, tmp_path):
        """Over-budget images are skipped (ignore-and-continue), not fatal."""
        rng = np.random.default_rng(0)
        d = tmp_path / "imgs"
        d.mkdir()
        Image.fromarray(
            rng.integers(0, 255, (400, 400, 3), dtype=np.uint8)
        ).save(d / "big.png")
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"small{i}.png")
        pp = "to_tensor|normalize(minus_one_to_one)|patchify(16, 16)"
        batches = list(create_dataloader(str(d), pp, batch_size=4))
        assert len(batches) == 1
        assert batches[0]["patches"].shape[0] == 4


class TestDecodeWorkers:
    """Threaded decode pool == serial path exactly (order, skips, content)."""

    def test_worker_pool_matches_serial(self, tmp_path):
        import numpy as np
        from PIL import Image

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(11):
            Image.fromarray(
                rng.integers(0, 255, (48 + 16 * (i % 3), 64, 3), np.uint8)
            ).save(d / f"i{i:02d}.png")
        (d / "broken.png").write_bytes(b"not an image")

        kw = dict(batch_size=3, partial=True, shuffle_buffer=0)
        serial = list(create_dataloader(str(d), PP, **kw))
        pooled = list(create_dataloader(str(d), PP, decode_workers=3, **kw))
        assert len(serial) == len(pooled)
        for a, b in zip(serial, pooled):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_worker_pool_num_samples(self, tmp_path):
        import numpy as np
        from PIL import Image

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.default_rng(1)
        for i in range(9):
            Image.fromarray(
                rng.integers(0, 255, (48, 64, 3), np.uint8)
            ).save(d / f"i{i}.png")
        loader = create_dataloader(
            str(d), PP, batch_size=2, num_samples=5, partial=True,
            decode_workers=2, shuffle_buffer=0,
        )
        n = sum(b["patches"].shape[0] for b in loader)
        assert n == 5
