"""CPU smoke tests for bench.py — the driver's headline artifact.

The driver parses the LAST stdout line of ``python bench.py`` as JSON
(headline fields at top level, matrix rows under "matrix"); a silent
breakage here loses the round's recorded result. These tests exercise
the full bench path (timing program, int8 quantization, SSIM gate, JSON
emission) on a tiny variant with the CPU backend so regressions surface
in the ordinary test run, not at driver time.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY = "w64_d2_h2-w64_d2_h2/1x16x16"


class TestBenchConfig:
    def test_rows_structure_and_gate(self):
        import bench

        rows, n_params = bench.bench_config(
            TINY, 64, 16, (4, 4), batch=2, iters=1, with_gate=True
        )
        assert n_params > 0
        assert [r["dtype"] for r in rows] == ["bf16", "int8"]
        for r in rows:
            assert r["img_per_s"] > 0 and r["ms_per_img"] > 0
            assert 0.0 <= r["mfu"]  # CPU MFU vs TPU peak is just tiny
        # int8 weights quantized from the same bf16 params must
        # reconstruct nearly identically on a tiny random model.
        assert rows[1]["ssim_vs_bf16"] > 0.95, rows[1]

    def test_gate_sensitive_not_vacuous(self):
        """The SSIM gate runs on gamma=O(1) weights: it must be < 1.0
        (at the reference init 1e-4 it tautologically reads 1.0)."""
        import bench

        rows, _ = bench.bench_config(
            TINY, 64, 16, (4, 4), batch=2, iters=1, with_gate=True
        )
        assert rows[1]["ssim_vs_bf16"] < 1.0, rows[1]

    def test_f32_family_row(self):
        """The patch-32 (f32) matrix row machinery: stride-32 batch + gate."""
        import bench

        rows, _ = bench.bench_config(
            "w64_d2_h2-w64_d2_h2/1x32x16", 64, 16, (4, 4), batch=2, iters=1,
            with_gate=True, patch=32,
        )
        assert [r["dtype"] for r in rows] == ["bf16", "int8"]
        assert 0.95 < rows[1]["ssim_vs_bf16"] < 1.0, rows[1]

    def test_patch_mismatch_rejected(self):
        import bench, pytest

        with pytest.raises(AssertionError):
            bench.bench_config(
                TINY, 64, 16, (4, 4), batch=2, iters=1, patch=32
            )

    def test_gate_skippable(self):
        import bench

        rows, _ = bench.bench_config(
            TINY, 64, 16, (4, 4), batch=2, iters=1, with_gate=False
        )
        assert "ssim_vs_bf16" not in rows[1]


class TestBenchCLI:
    def test_quick_emits_parseable_json(self):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run(
            [sys.executable, "bench.py", "--quick", "--batch", "2"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        last = out.stdout.strip().splitlines()[-1]
        parsed = json.loads(last)
        assert parsed["metric"] == "quick smoke"
        assert {r["dtype"] for r in parsed["rows"]} == {"bf16", "int8"}


class TestBenchE2E:
    """End-to-end system bench machinery (VERDICT r4 #1) on CPU."""

    def test_gen_image_dir_and_host_rate(self, tmp_path):
        import bench

        d = bench.gen_image_dir(str(tmp_path / "imgs"), 10, 64)
        import glob

        files = glob.glob(os.path.join(d, "*.jpg"))
        assert len(files) == 10
        pp = "to_tensor|normalize(minus_one_to_one)|patchify(16, 16)"
        rate, n = bench.host_pipeline_rate(d, pp, batch=4, n_images=8)
        assert n == 8 and rate > 0
        rate_np, _ = bench.host_pipeline_rate(
            d, pp, batch=4, n_images=8, native=False
        )
        assert rate_np > 0

    def test_e2e_config_row_shape(self, tmp_path):
        import bench

        d = bench.gen_image_dir(str(tmp_path / "imgs"), 24, 64)
        row = bench.bench_e2e_config(
            "tiny", TINY, 64, 16, (4, 4), 16, 4, d, 24, 16
        )
        for arm in ("tokenize", "recon"):
            assert row[arm]["img_per_s"] > 0
            assert row[arm]["n_images"] > 0
            segs = (row[arm]["data_stall_s"] + row[arm]["submit_s"]
                    + row[arm]["drain_s"])
            assert segs <= row[arm]["wall_s"] * 1.25 + 0.2
        assert row["host_img_per_s_native"] > 0
