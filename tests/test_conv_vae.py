"""Conv VAE (AutoencoderKL) parity vs an independent torch mini-implementation
with the reference's module naming."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from ldmae_tpu.models import conv_vae as cv

SPEC = cv.ConvVAESpec(
    ch=8,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(8,),
    decoder_attn_resolutions=(8,),
    resolution=16,
    z_channels=4,
    embed_dim=4,
    num_groups=4,
)


def t_norm(c):
    return nn.GroupNorm(num_groups=4, num_channels=c, eps=1e-6, affine=True)


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = t_norm(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = t_norm(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = t_norm(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        qf = q.reshape(b, c, -1).permute(0, 2, 1)
        kf = k.reshape(b, c, -1)
        w_ = torch.bmm(qf, kf) * (c**-0.5)
        w_ = torch.softmax(w_, dim=2)
        vf = v.reshape(b, c, -1)
        out = torch.bmm(vf, w_.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class TDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 2, 0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        ch, zc = 8, 4
        self.conv_in = nn.Conv2d(3, ch, 3, 1, 1)
        self.down = nn.ModuleList()
        # level 0: 16x16, ch 8 -> 8, no attn (attn at res 8)
        lvl0 = nn.Module()
        lvl0.block = nn.ModuleList([TResnet(8, 8)])
        lvl0.attn = nn.ModuleList([])
        lvl0.downsample = TDown(8)
        self.down.append(lvl0)
        # level 1: 8x8, ch 8 -> 16, attn
        lvl1 = nn.Module()
        lvl1.block = nn.ModuleList([TResnet(8, 16)])
        lvl1.attn = nn.ModuleList([TAttn(16)])
        self.down.append(lvl1)
        self.mid = nn.Module()
        self.mid.block_1 = TResnet(16, 16)
        self.mid.attn_1 = TAttn(16)
        self.mid.block_2 = TResnet(16, 16)
        self.norm_out = t_norm(16)
        self.conv_out = nn.Conv2d(16, 2 * zc, 3, 1, 1)

    def forward(self, x):
        h = self.conv_in(x)
        h = self.down[0].block[0](h)
        h = self.down[0].downsample(h)
        h = self.down[1].block[0](h)
        h = self.down[1].attn[0](h)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv2d(4, 16, 3, 1, 1)
        self.mid = nn.Module()
        self.mid.block_1 = TResnet(16, 16)
        self.mid.attn_1 = TAttn(16)
        self.mid.block_2 = TResnet(16, 16)
        self.up = nn.ModuleList()
        lvl0 = nn.Module()  # final level (16x16, ch 8)
        lvl0.block = nn.ModuleList([TResnet(16, 8), TResnet(8, 8)])
        lvl0.attn = nn.ModuleList([])
        self.up.append(lvl0)
        lvl1 = nn.Module()  # lowest res (8x8, ch 16), attn
        lvl1.block = nn.ModuleList([TResnet(16, 16), TResnet(16, 16)])
        lvl1.attn = nn.ModuleList([TAttn(16), TAttn(16)])
        lvl1.upsample = TUp(16)
        self.up.append(lvl1)
        self.norm_out = t_norm(8)
        self.conv_out = nn.Conv2d(8, 3, 3, 1, 1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        h = self.up[1].block[0](h)
        h = self.up[1].attn[0](h)
        h = self.up[1].block[1](h)
        h = self.up[1].attn[1](h)
        h = self.up[1].upsample(h)
        h = self.up[0].block[0](h)
        h = self.up[0].block[1](h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TVAE(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = TDecoder()
        self.quant_conv = nn.Conv2d(8, 8, 1)
        self.post_quant_conv = nn.Conv2d(4, 4, 1)


@pytest.fixture(scope="module")
def built():
    torch.manual_seed(0)
    tm = TVAE()
    for p in tm.parameters():
        nn.init.normal_(p, std=0.2)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = cv.import_conv_vae_state_dict(sd, SPEC)
    return tm, params


class TestConvVAE:
    def test_groupnorm(self):
        # our _group_norm uses groups=32 by default; test with matching c
        x = np.random.randn(2, 32, 4, 4).astype(np.float32)
        p = {"scale": jnp.asarray(np.random.rand(32).astype(np.float32)),
             "bias": jnp.asarray(np.random.rand(32).astype(np.float32))}
        ref = F.group_norm(
            torch.from_numpy(x), 32,
            torch.from_numpy(np.asarray(p["scale"])), torch.from_numpy(np.asarray(p["bias"])),
            eps=1e-6,
        ).numpy()
        out = cv._group_norm(jnp.asarray(x), p, groups=32)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_encoder_parity(self, built):
        tm, params = built
        x = torch.randn(2, 3, 16, 16)
        with torch.no_grad():
            ref = tm.encoder(x).numpy()
        out = cv.encoder_forward(params["encoder"], SPEC, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-3, atol=5e-4)

    def test_decoder_parity(self, built):
        tm, params = built
        z = torch.randn(2, 4, 8, 8)
        with torch.no_grad():
            ref = tm.decoder(z).numpy()
        out = cv.decoder_forward(params["decoder"], SPEC, jnp.asarray(z.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-3, atol=5e-4)

    @pytest.mark.slow
    def test_roundtrip_shapes_fullsize_init(self):
        """Random-init full-size spec: encode/decode shape contract."""
        spec = cv.ConvVAESpec(
            ch=16, ch_mult=(1, 2), num_res_blocks=1, resolution=16,
            attn_resolutions=(8,), decoder_attn_resolutions=(8,),
            z_channels=4, embed_dim=4, num_groups=4,
        )
        params = cv.init_conv_vae_params(jax.random.key(0), spec)
        x = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))
        post = cv.encode(params, spec, x)
        assert post.mean.shape == (2, 4, 8, 8)
        z = post.sample(jax.random.key(2))
        img = cv.decode(params, spec, z)
        assert img.shape == (2, 3, 16, 16)
        u8 = cv.decode_to_images(params, spec, z)
        assert u8.dtype == jnp.uint8 and u8.shape == (2, 16, 16, 3)

    def test_specs(self):
        assert cv.vavae_spec().z_channels == 32
        assert cv.marvae_spec().decoder_attn_resolutions == ()
        s = cv.sdvae_spec()
        assert not s.use_quant_conv and s.ch_mult == (1, 2, 4, 4)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestDiffusersImport:
    def test_key_mapping_covers_structure(self):
        """Synthesise a diffusers-named state dict with the right shapes and
        verify the mapped params load and run."""
        from ldmae_tpu.models.sdvae_import import diffusers_to_ldm_state_dict
        spec = cv.ConvVAESpec(
            ch=8, ch_mult=(1, 2), num_res_blocks=1,
            attn_resolutions=(), decoder_attn_resolutions=(),
            resolution=16, z_channels=4, embed_dim=4, num_groups=4,
            use_quant_conv=False, use_post_quant_conv=False,
        )
        rng = np.random.default_rng(0)
        sd = {}

        def conv(name, cout, cin, k):
            sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
            sd[f"{name}.bias"] = np.zeros(cout, np.float32)

        def gn(name, c):
            sd[f"{name}.weight"] = np.ones(c, np.float32)
            sd[f"{name}.bias"] = np.zeros(c, np.float32)

        def resnet(pre, cin, cout):
            gn(f"{pre}.norm1", cin); conv(f"{pre}.conv1", cout, cin, 3)
            gn(f"{pre}.norm2", cout); conv(f"{pre}.conv2", cout, cout, 3)
            if cin != cout:
                conv(f"{pre}.conv_shortcut", cout, cin, 1)

        def attn(pre, c):
            gn(f"{pre}.group_norm", c)
            for n in ("to_q", "to_k", "to_v"):
                sd[f"{pre}.{n}.weight"] = rng.standard_normal((c, c)).astype(np.float32) * 0.1
                sd[f"{pre}.{n}.bias"] = np.zeros(c, np.float32)
            sd[f"{pre}.to_out.0.weight"] = rng.standard_normal((c, c)).astype(np.float32) * 0.1
            sd[f"{pre}.to_out.0.bias"] = np.zeros(c, np.float32)

        conv("encoder.conv_in", 8, 3, 3)
        resnet("encoder.down_blocks.0.resnets.0", 8, 8)
        conv("encoder.down_blocks.0.downsamplers.0.conv", 8, 8, 3)
        resnet("encoder.down_blocks.1.resnets.0", 8, 16)
        resnet("encoder.mid_block.resnets.0", 16, 16)
        attn("encoder.mid_block.attentions.0", 16)
        resnet("encoder.mid_block.resnets.1", 16, 16)
        gn("encoder.conv_norm_out", 16)
        conv("encoder.conv_out", 8, 16, 3)

        conv("decoder.conv_in", 16, 4, 3)
        resnet("decoder.mid_block.resnets.0", 16, 16)
        attn("decoder.mid_block.attentions.0", 16)
        resnet("decoder.mid_block.resnets.1", 16, 16)
        # up_blocks: j=0 is the lowest res (LDM level 1)
        resnet("decoder.up_blocks.0.resnets.0", 16, 16)
        resnet("decoder.up_blocks.0.resnets.1", 16, 16)
        conv("decoder.up_blocks.0.upsamplers.0.conv", 16, 16, 3)
        resnet("decoder.up_blocks.1.resnets.0", 16, 8)
        resnet("decoder.up_blocks.1.resnets.1", 8, 8)
        gn("decoder.conv_norm_out", 8)
        conv("decoder.conv_out", 3, 8, 3)

        ldm = diffusers_to_ldm_state_dict(sd, spec)
        params = cv.import_conv_vae_state_dict(ldm, spec)
        x = jax.random.normal(jax.random.key(0), (1, 3, 16, 16))
        post = cv.encode(params, spec, x)
        assert post.mean.shape == (1, 4, 8, 8)
        img = cv.decode(params, spec, post.mode())
        assert img.shape == (1, 3, 16, 16)
        assert np.all(np.isfinite(np.asarray(img)))
        # q/k/v linear->conv reshape happened
        assert params["encoder"]["mid"]["attn_1"]["q"]["w"].shape == (16, 16, 1, 1)


class TestTokenizerWrappers:
    @pytest.mark.slow
    def test_factory_and_api(self):
        import jax
        from PIL import Image
        from ldmae_tpu.models import conv_vae as _cv
        from ldmae_tpu.models.tokenizers import MAR_VAE, SD_VAE, VA_VAE, build_tokenizer

        # tiny conv spec to keep CPU cost low: patch the spec factories
        tiny = _cv.ConvVAESpec(
            ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
            decoder_attn_resolutions=(), resolution=16, z_channels=4,
            embed_dim=4, num_groups=4,
        )
        from unittest import mock

        with mock.patch.object(_cv, "vavae_spec", lambda embed_dim=32: tiny), \
             mock.patch.object(_cv, "marvae_spec", lambda embed_dim=16: tiny), \
             mock.patch.object(_cv, "sdvae_spec", lambda: tiny):
            for cls in (VA_VAE, MAR_VAE, SD_VAE):
                tok = cls(None, img_size=16)
                tf = tok.img_transform(p_hflip=0, img_size=16)
                img = tf(Image.fromarray(np.zeros((24, 30, 3), np.uint8)))
                assert img.shape == (3, 16, 16)
                z = tok.encode_images(img[None])
                assert z.shape == (1, 4, 8, 8)
                dec = tok.decode_to_images(z)
                assert dec.shape == (1, 16, 16, 3) and dec.dtype == np.uint8

    def test_build_tokenizer_dispatch(self):
        from ldmae_tpu.models.tokenizers import build_tokenizer
        with pytest.raises(ValueError):
            build_tokenizer("nope")
