"""int8 quantization stack (ops/quant.py, fused quant kernels, model wiring).

The reference has no quantized path — this is the TPU-native sampling
perf lever (PERF.md round 2). Tests run the Pallas kernels in interpret
mode on CPU; the accuracy gate vs the bf16 pipeline is asserted here and
the FID-proxy A/B lives in perf_quant.py / EVAL_NOTES.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmae_tpu.ops.linear import dense, swiglu_ffn
from ldmae_tpu.ops.quant import (
    _quantize_rows,
    qdense,
    qdense_pre,
    quantize_linear,
    swiglu_ffn_quant,
)


def _rand_linear(key, k, n, bias=True):
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.normal(kw, (k, n)) * 0.05}
    if bias:
        p["b"] = jax.random.normal(kb, (n,)) * 0.01
    return p


class TestQuantizeLinear:
    def test_weight_roundtrip_error(self):
        p = _rand_linear(jax.random.key(0), 64, 32)
        q = quantize_linear(p)
        assert q["w_q"].dtype == jnp.int8
        assert q["w_scale"].shape == (32,)
        w_back = q["w_q"].astype(jnp.float32) * q["w_scale"][None, :]
        err = np.abs(np.asarray(w_back) - np.asarray(p["w"]))
        # symmetric per-column int8: |dw| <= scale/2 = absmax/254
        bound = np.abs(np.asarray(p["w"])).max(0) / 254 + 1e-8
        assert (err <= bound[None, :] * 1.001).all()

    def test_stacked_leading_axes(self):
        p = {"w": jax.random.normal(jax.random.key(1), (3, 16, 8))}
        q = quantize_linear(p)
        assert q["w_q"].shape == (3, 16, 8)
        assert q["w_scale"].shape == (3, 8)

    def test_w8_close_to_dense(self):
        p = _rand_linear(jax.random.key(2), 128, 64)
        x = jax.random.normal(jax.random.key(3), (5, 128), jnp.float32)
        ref = dense(x, p)
        out = qdense(x, quantize_linear(p), mode="w8")
        # weight-only: error bounded by quant noise times |x|
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.05

    def test_w8a8_close_to_dense(self):
        p = _rand_linear(jax.random.key(4), 128, 64)
        x = jax.random.normal(jax.random.key(5), (5, 128), jnp.float32)
        ref = np.asarray(dense(x, p))
        out = np.asarray(qdense(x, quantize_linear(p), mode="w8a8"))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.02

    def test_qdense_pre_matches_qdense(self):
        p = quantize_linear(_rand_linear(jax.random.key(6), 64, 32))
        x = jax.random.normal(jax.random.key(7), (4, 64), jnp.float32)
        x_q, x_s = _quantize_rows(x)
        a = np.asarray(qdense(x, p, mode="w8a8"))
        b = np.asarray(qdense_pre(x_q, x_s, p, compute_dtype=jnp.float32))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_unknown_mode_raises(self):
        p = quantize_linear(_rand_linear(jax.random.key(8), 8, 8))
        with pytest.raises(ValueError):
            qdense(jnp.ones((2, 8)), p, mode="w4")


class TestFusedQuantKernels:
    def test_norm_modulate_quant_matches_xla(self):
        from ldmae_tpu.ops.fused_adaln import (
            fused_norm_modulate,
            fused_norm_modulate_quant,
        )

        b, n, d = 2, 64, 32
        x = jax.random.normal(jax.random.key(0), (b, n, d), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (d,)) * 0.1 + 1.0
        shift = jax.random.normal(jax.random.key(2), (b, d)) * 0.3
        scale = jax.random.normal(jax.random.key(3), (b, d)) * 0.3
        for kind in ("rms", "layer"):
            ref = fused_norm_modulate(x, w, shift, scale, kind=kind)
            o_q, s = fused_norm_modulate_quant(x, w, shift, scale, kind=kind)
            assert o_q.dtype == jnp.int8 and s.shape == (b, n, 1)
            deq = np.asarray(o_q, np.float32) * np.asarray(s)
            err = np.abs(deq - np.asarray(ref, np.float32))
            bound = np.abs(np.asarray(ref)).max(-1, keepdims=True) / 254 + 1e-6
            assert (err <= bound * 1.01).all(), kind

    def test_silu_mul_quant_matches_xla(self):
        from ldmae_tpu.ops.fused_adaln import fused_silu_mul_quant

        b, n, h = 2, 64, 48
        x12 = jax.random.normal(jax.random.key(4), (b, n, 2 * h), jnp.float32)
        x1, x2 = x12[..., :h], x12[..., h:]
        ref = np.asarray(jax.nn.silu(x1) * x2)
        o_q, s = fused_silu_mul_quant(x12)
        deq = np.asarray(o_q, np.float32) * np.asarray(s)
        bound = np.abs(ref).max(-1, keepdims=True) / 254 + 1e-6
        assert (np.abs(deq - ref) <= bound * 1.01).all()

    def test_swiglu_ffn_quant_close_to_fp(self):
        h = 48
        p = {
            "w12": _rand_linear(jax.random.key(5), 32, 2 * h),
            "w3": _rand_linear(jax.random.key(6), h, 32),
        }
        x = jax.random.normal(jax.random.key(7), (2, 64, 32), jnp.float32)
        ref = np.asarray(swiglu_ffn(x, p))
        pq = {k: quantize_linear(v) for k, v in p.items()}
        x_q, x_s = _quantize_rows(x)
        out = np.asarray(swiglu_ffn_quant(x_q, x_s, pq, compute_dtype=jnp.float32))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.03


class TestQuantizedDiT:
    @pytest.fixture(scope="class")
    def setup(self):
        from ldmae_tpu.models.lightningdit import (
            DiTConsts,
            DiTSpec,
            init_dit_params,
            merge_swiglu,
            permute_qk_for_half_rope,
            quantize_dit_params,
        )

        spec = DiTSpec(
            input_size=8, patch_size=1, in_channels=4, hidden_size=64,
            depth=3, num_heads=4, num_classes=10, use_qknorm=True,
            use_swiglu=True, use_rope=True, use_rmsnorm=True,
        )
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        # give the zero-init adaLN/final weights signal so quantization is
        # actually exercised
        params = jax.tree_util.tree_map(
            lambda p: p + 0.02 * jax.random.normal(jax.random.key(1), p.shape),
            params,
        )
        params = merge_swiglu(permute_qk_for_half_rope(params, spec), spec)
        qparams = quantize_dit_params(params, spec)
        return spec, consts, params, qparams

    def test_structure(self, setup):
        spec, _, _, qp = setup
        blocks = qp["blocks"]
        assert blocks["attn"]["qkv"]["w_q"].shape == (3, 64, 192)
        assert blocks["attn"]["qkv"]["w_q"].dtype == jnp.int8
        assert "w" in blocks["attn"]["proj"]  # proj NOT quantized
        assert blocks["mlp"]["w12"]["w_q"].dtype == jnp.int8
        assert blocks["adaln"]["w_q"].shape == (3, 64, 6 * 64)
        assert "w" in qp["final_layer"]["linear"]  # final layer fp

    @pytest.mark.parametrize("adaln_impl", ["xla", "fused"])
    def test_forward_close_to_fp(self, setup, adaln_impl):
        from ldmae_tpu.models.lightningdit import dit_forward

        spec, consts, params, qparams = setup
        x = jax.random.normal(jax.random.key(2), (2, 4, 8, 8), jnp.float32)
        t = jnp.array([0.3, 0.8])
        y = jnp.array([1, 5])
        common = dict(
            train=False, compute_dtype=jnp.float32, attn_impl="xla",
            rope_layout="half",
        )
        ref = np.asarray(dit_forward(params, spec, consts, x, t, y, **common))
        out = np.asarray(dit_forward(
            qparams, spec, consts, x, t, y, quant_mode="w8a8",
            adaln_impl=adaln_impl, **common,
        ))
        rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
        assert rel < 0.05, (adaln_impl, rel)

    def test_fused_and_xla_quant_paths_agree(self, setup):
        from ldmae_tpu.models.lightningdit import dit_forward

        spec, consts, _, qparams = setup
        x = jax.random.normal(jax.random.key(3), (2, 4, 8, 8), jnp.float32)
        t = jnp.array([0.5, 0.5])
        y = jnp.array([0, 9])
        common = dict(
            train=False, compute_dtype=jnp.float32, attn_impl="xla",
            rope_layout="half", quant_mode="w8a8",
        )
        a = np.asarray(dit_forward(qparams, spec, consts, x, t, y,
                                   adaln_impl="xla", **common))
        b = np.asarray(dit_forward(qparams, spec, consts, x, t, y,
                                   adaln_impl="fused", **common))
        # both quantize the same fp32 epilogue output; only op order differs
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert rel < 0.02

    def test_w8_mode_tighter_than_w8a8(self, setup):
        from ldmae_tpu.models.lightningdit import dit_forward

        spec, consts, params, qparams = setup
        x = jax.random.normal(jax.random.key(4), (2, 4, 8, 8), jnp.float32)
        t = jnp.array([0.1, 0.9])
        y = jnp.array([2, 3])
        common = dict(
            train=False, compute_dtype=jnp.float32, attn_impl="xla",
            rope_layout="half",
        )
        ref = np.asarray(dit_forward(params, spec, consts, x, t, y, **common))
        w8 = np.asarray(dit_forward(qparams, spec, consts, x, t, y,
                                    quant_mode="w8", **common))
        w8a8 = np.asarray(dit_forward(qparams, spec, consts, x, t, y,
                                      quant_mode="w8a8", **common))
        e8 = np.linalg.norm(w8 - ref)
        e88 = np.linalg.norm(w8a8 - ref)
        assert e8 < 0.05 * np.linalg.norm(ref)
        assert e8 <= e88 * 1.5  # weight-only should not be (much) worse


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestQuantPhasedSampling:
    @pytest.mark.slow
    def test_full_sampling_stack_combination(self):
        """quant w8a8 + fused adaLN + phased CFG together through
        make_sample_fn (the bench/inference configuration) must agree with
        the quantized unphased pipeline and stay finite."""
        from ldmae_tpu.eval.sampling import make_sample_fn
        from ldmae_tpu.models.lightningdit import (
            DiTConsts, DiTSpec, init_dit_params, merge_swiglu,
            permute_qk_for_half_rope, quantize_dit_params,
        )
        from ldmae_tpu.transport import create_transport

        spec = DiTSpec(
            input_size=8, patch_size=1, in_channels=4, hidden_size=64, depth=2,
            num_heads=4, num_classes=8, use_qknorm=True, use_swiglu=True,
            use_rope=True, use_rmsnorm=True,
        )
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        params = jax.tree_util.tree_map(
            lambda p: p + 0.02 * jax.random.normal(jax.random.key(1), p.shape),
            params,
        )
        params = quantize_dit_params(
            merge_swiglu(permute_qk_for_half_rope(params, spec), spec), spec
        )
        outs = {}
        for phased in (False, True):
            fn = make_sample_fn(
                spec, consts, create_transport("Linear", "velocity"),
                num_steps=16, sampling_method="euler", timestep_shift=0.3,
                cfg_scale=4.0, cfg_interval=True, cfg_interval_start=0.10,
                cfg_channels=3, compute_dtype=jnp.float32,
                rope_layout="half", adaln_impl="fused", quant_mode="w8a8",
                cfg_phase_split=phased,
            )
            y = jnp.arange(4, dtype=jnp.int32) % 8
            outs[phased] = np.asarray(jax.jit(fn)({"dit": params}, jax.random.key(2), y))
            assert np.all(np.isfinite(outs[phased]))
        np.testing.assert_allclose(outs[True], outs[False], rtol=1e-5, atol=1e-6)
