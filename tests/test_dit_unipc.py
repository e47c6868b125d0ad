"""DiT + UniPC tests — mirrors the reference's documented API surface
(tests/cpu/test_dit.py, tests/cpu/test_unipc.py) plus a convergence check
the reference never had: exact recovery of x0 for a linear flow field.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitok_tpu.models.dit import (
    DiT,
    decode_variant as decode_dit_variant,
    timestep_embedding,
)
from vitok_tpu.unipc import FlowUniPCMultistepScheduler


def dit_input(b=2, n=64, c=32, seed=0, with_pos=True):
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(n))
    d = {
        "z": jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32)),
        "t": jnp.asarray(rng.integers(0, 1000, (b,)).astype(np.float32)),
        "context": jnp.asarray(rng.integers(0, 1000, (b,))),
    }
    if with_pos:
        yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
        d["row_idx"] = jnp.tile(jnp.asarray(yy.ravel())[None], (b, 1))
        d["col_idx"] = jnp.tile(jnp.asarray(xx.ravel())[None], (b, 1))
    return d


SMALL = dict(width=64, depth=2, heads=2, mlp_factor=2.0, max_tokens=64)


class TestDiT:
    def test_variant_dsl(self):
        p = decode_dit_variant("Bd4/256")
        assert p["width"] == 768 and p["depth"] == 4 and p["max_tokens"] == 256

    def test_instantiation(self):
        m = DiT(**decode_dit_variant("Bd4/256"), code_width=32, text_dim=1000)
        assert m.code_width == 32 and m.text_dim == 1000
        assert m.num_params() > 1_000_000

    def test_forward_shape(self):
        m = DiT(**SMALL, code_width=32, text_dim=100, attn_impl="xla")
        d = dit_input()
        out = m(d)
        assert out.shape == d["z"].shape
        assert not bool(jnp.isnan(out).any())

    def test_forward_without_positions(self):
        m = DiT(**SMALL, code_width=32, text_dim=100, attn_impl="xla")
        out = m(dit_input(with_pos=False))
        assert out.shape == (2, 64, 32)

    def test_seq_lengths(self):
        m = DiT(**SMALL, code_width=32, text_dim=100, attn_impl="xla")
        for side in (4, 8):
            out = m(dit_input(n=side * side))
            assert out.shape == (2, side * side, 32)

    def test_cfg_batch_doubling(self):
        m = DiT(**SMALL, code_width=16, text_dim=10, attn_impl="xla")
        d = dit_input(b=2, c=16)
        d["context"] = jnp.array([3, 5])
        null = jnp.array([10, 10])
        d2 = {
            "z": jnp.concatenate([d["z"], d["z"]]),
            "t": jnp.concatenate([d["t"], d["t"]]),
            "context": jnp.concatenate([d["context"], null]),
            "row_idx": jnp.concatenate([d["row_idx"], d["row_idx"]]),
            "col_idx": jnp.concatenate([d["col_idx"], d["col_idx"]]),
        }
        out = m(d2)
        cond, uncond = out[:2], out[2:]
        guided = uncond + 4.0 * (cond - uncond)
        assert not bool(jnp.isnan(guided).any())
        # cond vs uncond must differ (class conditioning is live)
        assert float(jnp.abs(cond - uncond).max()) > 1e-6

    def test_special_tokens(self):
        m = DiT(
            **SMALL, code_width=16, text_dim=10,
            class_token=True, reg_tokens=4, attn_impl="xla",
        )
        assert m.cls_token is not None and m.reg_token is not None
        assert m.num_special_tokens == 5
        out = m(dit_input(b=1, c=16))
        assert out.shape == (1, 64, 16)  # specials stripped

    def test_timestep_embedding(self):
        t = jnp.array([0.0, 500.0, 999.0])
        emb = timestep_embedding(t, 256)
        assert emb.shape == (3, 256)
        assert float(jnp.abs(emb).max()) <= 1.0 + 1e-6
        assert float(jnp.abs(emb[0] - emb[1]).max()) > 1e-3
        for dim in (64, 128, 512):
            assert timestep_embedding(t, dim).shape == (3, dim)


class TestUniPC:
    def test_defaults(self):
        s = FlowUniPCMultistepScheduler()
        assert s.config.num_train_timesteps == 1000
        assert s.config.solver_order == 2
        assert s.config.prediction_type == "flow_prediction"

    def test_set_timesteps(self):
        s = FlowUniPCMultistepScheduler()
        s.set_timesteps(num_inference_steps=20)
        assert s.num_inference_steps == 20
        assert len(s.timesteps) == 20
        assert len(s.sigmas) == 21
        assert s.sigmas[0] > 0.9 and s.sigmas[-1] <= 0.01
        ts = s.timesteps
        assert all(ts[i] > ts[i + 1] for i in range(len(ts) - 1))

    def test_shift_changes_sigmas(self):
        a = FlowUniPCMultistepScheduler(shift=1.0)
        b = FlowUniPCMultistepScheduler(shift=3.0)
        a.set_timesteps(20)
        b.set_timesteps(20)
        assert not np.allclose(a.sigmas, b.sigmas)

    def test_time_shift_identity(self):
        s = FlowUniPCMultistepScheduler(use_dynamic_shifting=True)
        out = s.time_shift(0.0, 1.0, np.array([0.5]))
        expected = 1.0 / (1.0 + (1.0 / 0.5 - 1.0))
        assert abs(float(out[0]) - expected) < 1e-5

    def test_step_all_timesteps_finite(self):
        rng = np.random.default_rng(0)
        s = FlowUniPCMultistepScheduler()
        s.set_timesteps(10)
        sample = rng.standard_normal((2, 64, 32)).astype(np.float32)
        for t in s.timesteps:
            mo = rng.standard_normal(sample.shape).astype(np.float32)
            sample = s.step(mo, t, sample).prev_sample
            assert np.isfinite(np.asarray(sample)).all()

    def test_return_dict_false(self):
        s = FlowUniPCMultistepScheduler()
        s.set_timesteps(10)
        sample = np.zeros((1, 8, 4), np.float32)
        out = s.step(np.zeros_like(sample), s.timesteps[0], sample,
                     return_dict=False)
        assert isinstance(out, tuple) and len(out) == 1

    def test_add_noise(self):
        s = FlowUniPCMultistepScheduler()
        s.set_timesteps(20)
        rng = np.random.default_rng(1)
        x0 = rng.standard_normal((1, 16, 8)).astype(np.float32)
        eps = rng.standard_normal(x0.shape).astype(np.float32)
        early = s.add_noise(x0, eps, np.array([s.timesteps[0]]))
        late = s.add_noise(x0, eps, np.array([s.timesteps[-1]]))
        assert np.abs(early - x0).mean() > np.abs(late - x0).mean()

    def test_scale_model_input_identity(self):
        s = FlowUniPCMultistepScheduler()
        x = np.ones((2, 3))
        assert np.allclose(s.scale_model_input(x), x)

    def test_determinism(self):
        results = []
        for _ in range(2):
            rng = np.random.default_rng(42)
            s = FlowUniPCMultistepScheduler()
            s.set_timesteps(10)
            sample = rng.standard_normal((1, 16, 4)).astype(np.float32)
            for t in s.timesteps:
                mo = rng.standard_normal(sample.shape).astype(np.float32) * 0.1
                sample = s.step(mo, t, sample).prev_sample
            results.append(np.asarray(sample))
        np.testing.assert_allclose(results[0], results[1], atol=1e-6)

    @pytest.mark.parametrize("solver_type", ["bh1", "bh2"])
    @pytest.mark.parametrize("steps", [5, 20])
    def test_exact_linear_flow_recovery(self, solver_type, steps):
        """With the exact constant velocity eps - x0, sampling from eps at
        sigma=1 down to sigma=0 must recover x0 (the flow ODE is linear)."""
        rng = np.random.default_rng(3)
        x0 = rng.standard_normal((1, 8, 4)).astype(np.float32)
        eps = rng.standard_normal(x0.shape).astype(np.float32)
        v = eps - x0  # exact velocity everywhere

        s = FlowUniPCMultistepScheduler(solver_type=solver_type)
        s.set_timesteps(steps)
        sample = eps.copy()
        for t in s.timesteps:
            sample = s.step(v, t, sample).prev_sample
        err = np.abs(np.asarray(sample) - x0).max()
        assert err < 5e-2, err


def test_dit_non_square_implicit_grid():
    """Token counts that aren't perfect squares fall back to a ceil grid."""
    m = DiT(**SMALL, code_width=8, text_dim=10, attn_impl="xla")
    out = m(dit_input(n=60, c=8, with_pos=False))
    assert out.shape == (2, 60, 8)


class TestDeviceSampler:
    """sample_flow_unipc_device == the host step() loop, step for step."""

    def _host_loop(self, sched, v_fn, z0, steps):
        sched.set_timesteps(steps)
        z = np.asarray(z0, np.float32)
        for t in sched.timesteps:
            v = np.asarray(v_fn(jnp.asarray(z), float(t)), np.float32)
            z = np.asarray(sched.step(v, t, z).prev_sample, np.float32)
        return z

    @pytest.mark.parametrize("solver_type", ["bh1", "bh2"])
    @pytest.mark.parametrize("steps", [3, 7, 20])
    def test_matches_host_scheduler(self, solver_type, steps):
        from vitok_tpu.unipc import sample_flow_unipc_device

        rng = np.random.default_rng(5)
        z0 = rng.standard_normal((2, 16, 8)).astype(np.float32)
        # A nonlinear data-dependent "model": exercises the history/
        # corrector paths non-trivially (a constant field would hide
        # coefficient errors on the D1 terms).
        w = rng.standard_normal((8, 8)).astype(np.float32) * 0.3

        def v_fn(z, t):
            return jnp.tanh(z @ w) + 0.01 * t * z

        sched = FlowUniPCMultistepScheduler(solver_type=solver_type, shift=3.0)
        want = self._host_loop(sched, v_fn, z0, steps)
        got = np.asarray(
            sample_flow_unipc_device(
                v_fn, jnp.asarray(z0), scheduler=sched, steps=steps
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_disable_corrector_respected(self):
        from vitok_tpu.unipc import sample_flow_unipc_device

        rng = np.random.default_rng(6)
        z0 = rng.standard_normal((1, 8, 4)).astype(np.float32)

        def v_fn(z, t):
            return jnp.sin(z) * 0.5

        sched = FlowUniPCMultistepScheduler(disable_corrector=[0, 2])
        want = self._host_loop(sched, v_fn, z0, 6)
        got = np.asarray(
            sample_flow_unipc_device(
                v_fn, jnp.asarray(z0), scheduler=sched, steps=6
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_dynamic_shifting_mu_forwarded(self):
        """mu/shift must reach the coefficient probe (advisor r5: a fresh
        scheduler was probed without them, silently diverging from the
        host loop for dynamic-shifting schedules)."""
        from vitok_tpu.unipc import sample_flow_unipc_device

        rng = np.random.default_rng(7)
        z0 = rng.standard_normal((1, 8, 4)).astype(np.float32)

        def v_fn(z, t):
            return jnp.cos(z) * 0.3

        sched = FlowUniPCMultistepScheduler(use_dynamic_shifting=True)
        sched.set_timesteps(6, mu=2.0)
        z = np.asarray(z0, np.float32)
        for t in sched.timesteps:
            v = np.asarray(v_fn(jnp.asarray(z), float(t)), np.float32)
            z = np.asarray(sched.step(v, t, z).prev_sample, np.float32)

        got = np.asarray(sample_flow_unipc_device(
            v_fn, jnp.asarray(z0),
            scheduler=FlowUniPCMultistepScheduler(use_dynamic_shifting=True),
            steps=6, mu=2.0,
        ))
        np.testing.assert_allclose(got, z, atol=2e-5, rtol=1e-5)

    def test_exact_linear_flow_recovery_device(self):
        from vitok_tpu.unipc import sample_flow_unipc_device

        rng = np.random.default_rng(3)
        x0 = rng.standard_normal((1, 8, 4)).astype(np.float32)
        eps = rng.standard_normal(x0.shape).astype(np.float32)
        v = jnp.asarray(eps - x0)

        got = np.asarray(
            sample_flow_unipc_device(
                lambda z, t: v, jnp.asarray(eps),
                scheduler=FlowUniPCMultistepScheduler(), steps=20,
            )
        )
        assert np.abs(got - x0).max() < 5e-2


class TestDiTQuantize:
    """DiT.quantize(): int8 block linears, AE-recipe parity (round 5)."""

    def _sensitive_dit(self, **kw):
        """DiT with O(1) adaLN gates: the zero-init mod kernels gate every
        block's contribution to ~0, which would make any int8-vs-bf16
        comparison vacuous (same trap as the AE LayerScale gates, VERDICT
        r3 #1)."""
        dit = DiT(width=128, depth=2, heads=2, code_width=8, text_dim=10,
                  **kw)
        rng = np.random.default_rng(0)
        blocks = dit.params["blocks"]
        blocks["mod"]["kernel"] = jnp.asarray(
            rng.normal(0, 0.15, blocks["mod"]["kernel"].shape), jnp.float32
        )
        blocks["mod"]["bias"] = jnp.asarray(
            rng.normal(0, 0.3, blocks["mod"]["bias"].shape), jnp.float32
        )
        return dit

    def _input(self, b=2, n=16, c=8):
        rng = np.random.default_rng(1)
        return {
            "z": rng.standard_normal((b, n, c)).astype(np.float32),
            "t": np.array([100.0, 500.0], np.float32),
            "context": np.array([1, 2], np.int32),
        }

    def test_quantized_structure(self):
        dit = self._sensitive_dit()
        dit.quantize()
        blk = dit.params["blocks"]
        for path in (("attn", "qkv"), ("attn", "out"), ("ffn", "fc1"),
                     ("ffn", "fc2")):
            sub = blk
            for k in path:
                sub = sub[k]
            assert "kernel_int8" in sub and "scale" in sub, path
        # adaLN mod, t_embed, final head stay full precision
        assert "kernel" in blk["mod"]
        assert "kernel" in dit.params["t_embed"]["fc1"]
        assert "kernel" in dit.params["final"]["proj"]

    def test_quantize_idempotent(self):
        dit = self._sensitive_dit()
        dit.quantize()
        q1 = dit.params["blocks"]["attn"]["qkv"]["kernel_int8"]
        dit.quantize()
        assert dit.params["blocks"]["attn"]["qkv"]["kernel_int8"] is q1

    def test_int8_close_to_bf16(self):
        dit = self._sensitive_dit()
        x = self._input()
        ref = np.asarray(dit(x), np.float32)
        dit.quantize()
        got = np.asarray(dit(x), np.float32)
        assert ref.shape == got.shape
        denom = np.abs(ref).mean() + 1e-6
        rel = np.abs(got - ref).mean() / denom
        assert rel < 0.05, rel
        # non-vacuity: int8 must actually change the numbers
        assert np.abs(got - ref).max() > 0

    def test_quantized_sampling_finite_and_close(self):
        from vitok_tpu.unipc import sample_flow_unipc_device

        dit = self._sensitive_dit()
        b, n, cw = 2, 16, 8

        def v_fn_of(d):
            def v_fn(z, t):
                return d({
                    "z": z, "t": jnp.full((b,), 1.0) * t,
                    "context": jnp.asarray([1, 2], jnp.int32),
                }).astype(jnp.float32)
            return v_fn

        z0 = jnp.asarray(
            np.random.default_rng(3).standard_normal((b, n, cw)), jnp.float32
        )
        sched = FlowUniPCMultistepScheduler(shift=3.0)
        ref = np.asarray(sample_flow_unipc_device(
            v_fn_of(dit), z0, scheduler=sched, steps=5))
        dit.quantize()
        got = np.asarray(sample_flow_unipc_device(
            v_fn_of(dit), z0, scheduler=sched, steps=5))
        assert np.all(np.isfinite(got))
        rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-6)
        assert rel < 0.1, rel


class TestDiTFusedAttentionWiring:
    """The megakernel consumes DiT's flat QKV exactly as _dit_block wires it
    (interpret mode — validates argument order/conventions off-TPU)."""

    def test_fused_matches_xla_composition(self):
        from vitok_tpu.ops.attention import dot_product_attention
        from vitok_tpu.ops.fused_attention import fused_qkv_attention
        from vitok_tpu.ops.norms import rms_norm
        from vitok_tpu.ops.rope import apply_rotary_emb, compute_2d_freqs_cis

        b, n, heads, d = 2, 16, 2, 64
        c = heads * d
        rng = np.random.default_rng(5)
        qkv_flat = jnp.asarray(
            rng.standard_normal((b, n, 3 * c)).astype(np.float32)
        )
        nq = jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32)
        nk = jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32)
        yy, xx = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
        row = jnp.tile(jnp.asarray(yy.ravel(), jnp.float32)[None], (b, 1))
        col = jnp.tile(jnp.asarray(xx.ravel(), jnp.float32)[None], (b, 1))
        cos, sin = compute_2d_freqs_cis(row, col, d, 10000.0)

        # the _dit_block xla composition
        qkv = qkv_flat.reshape(b, n, 3, heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = rms_norm(q, nq)
        k = rms_norm(k, nk)
        q, k = apply_rotary_emb(q, k, cos, sin, convention="half")
        want = dot_product_attention(q, k, v, impl="xla").reshape(b, n, c)

        got = fused_qkv_attention(
            qkv_flat, nq, nk, cos, sin, jnp.ones((b, n), jnp.int32),
            num_heads=heads, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
        )
