"""Training-GRADIENT parity against the reference's own modules under torch
autograd.

Every other torch anchor in this suite is forward/no-grad; these tests close
the one bug class they cannot see — a wrong custom VJP, a missing
stop-gradient, or an autodiff asymmetry anywhere in the train path:

  * DiT: the full train-step loss (transport velocity + cosine loss,
    label-dropout active) through `jax.grad`, vs torch autograd through the
    reference LightningDiT + the reference transport package
    (/root/reference/LDMAE/train_accum.py:215-230, transport/transport.py:
    169-215). Covered paths: the xla baseline AND the shipped production
    config (attn_impl=flash_rope + remat_policy=attn + fused adaLN — all
    custom-VJP Pallas kernels, interpret mode on CPU).
  * VMAE: `forward_vanilla` (stage 1: masking, KL posterior sampling, the
    visible/masked loss split; models_mae.py:773-807) and `forward_ldmae`
    (stage 3: frozen encoder, decoder-only grads; models_mae.py:809-826,
    misc.py:148-163) vs torch autograd on the reference MaskedAutoencoderViT.

Randomness is shared by injection: t is pinned via sp_timesteps=(c, c) (the
reference multiplies its rand by hi-lo = 0), x0/mask-noise/posterior-eps are
fixed arrays passed to our forwards (`x0=`, `mask_noise=`, `latent_noise=`)
and monkeypatched into torch's rand/randn_like/randn_tensor.

Gradients are compared per parameter LEAF after pushing the torch grads
through the same state_dict->pytree mapping as the weights (every transform
in torch_import is a transpose/reshape/stack — linear reindexing, hence
valid for gradients).

The torch side runs in float64 (the exact anchor); ours runs the production
fp32 path. Leaves are compared by relative L2 norm error ||a-b||/||b||: a
wrong VJP / missing stop-gradient produces O(1) relative error, while fp32
rounding through a depth-2 net stays < ~1e-4 (measured; bound set 20x above
the observed floor).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ref_loader import load_ref_lightningdit, load_ref_transport, load_ref_vmae

from ldmae_tpu.models.lightningdit import DiTConsts, DiTSpec, dit_forward
from ldmae_tpu.models import vmae as vmae_mod
from ldmae_tpu.models.vmae import VMAEConsts, VMAESpec
from ldmae_tpu.train import torch_import
from ldmae_tpu.transport.transport import create_transport

pytestmark = pytest.mark.slow


def _grad_state_dict(model):
    """{name: grad-or-zeros} with the exact key set of state_dict(), so the
    importer's layout mapping applies unchanged (buffers -> zeros)."""
    grads = {n: p.grad for n, p in model.named_parameters()}
    out = {}
    for k, v in model.state_dict().items():
        g = grads.get(k)
        out[k] = (g if g is not None else torch.zeros_like(v)).detach().clone()
    return out


def _assert_tree_close(ours, ref, tol, only_paths=None):
    """Per-leaf relative-L2-norm gradient comparison: ||a-b|| <= tol*||b||
    (absolute floor tol*1e-3 for near-zero-gradient leaves)."""
    checked, errs = [], {}

    def visit(path, a, b):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if only_paths is not None and not any(s in name for s in only_paths):
            return
        checked.append(name)
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        nb = float(np.linalg.norm(b))
        err = float(np.linalg.norm(a - b)) / max(nb, 1e-3)
        errs[name] = err
        assert err <= tol, (
            f"gradient mismatch at leaf {name}: rel-norm err {err:.3e} > {tol}"
            f" (||ref||={nb:.3e})"
        )

    jax.tree_util.tree_map_with_path(visit, ours, ref)
    assert checked, "no leaves compared"
    worst = max(errs, key=errs.get)
    print(f"worst leaf: {worst} rel-norm err {errs[worst]:.3e} (tol {tol})")
    return checked


# ---------------------------------------------------------------------------
# DiT train-step gradient parity
# ---------------------------------------------------------------------------

DIT_DIMS = dict(
    input_size=8, patch_size=1, in_channels=4, hidden_size=64, depth=2,
    num_heads=4, num_classes=10, class_dropout_prob=0.1, learn_sigma=False,
    use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
)
T_FIXED = 0.37


@pytest.fixture(scope="module")
def dit_torch_grads():
    """Reference model + transport: one train-step loss backward, with every
    random draw pinned. Returns (state_dict, grads_sd, drop_mask, x1, x0, y,
    ref_loss)."""
    ld = load_ref_lightningdit()
    tr = load_ref_transport()
    torch.manual_seed(0)
    model = ld.LightningDiT(**DIT_DIMS)
    # zero-init leaves (adaLN projections, final linear) would make the
    # model output exactly 0, where torch's cosine_similarity clamp and our
    # safe-norm differ in (sub)gradient; perturb to generic position like
    # any post-step-1 training state. Trainable leaves only: pos_embed is a
    # frozen nn.Parameter (lightningdit.py:314) that our side recomputes as
    # a sincos const — perturbing it would desync the two models.
    with torch.no_grad():
        for p in model.parameters():
            if p.requires_grad:
                p.add_(0.01 * torch.randn_like(p))
    model.double().train()  # f64 = the exact anchor; ours runs fp32

    g = torch.Generator().manual_seed(7)
    x1 = torch.randn(4, 4, 8, 8, generator=g, dtype=torch.float64)
    x0 = torch.randn(4, 4, 8, 8, generator=g, dtype=torch.float64)
    y = torch.tensor([1, 3, 9, 0])
    u_drop = torch.tensor([0.05, 0.5, 0.9, 0.02], dtype=torch.float64)

    transport = tr.create_transport(
        path_type="Linear", prediction="velocity",
        use_cosine_loss=True, use_lognorm=True,
    )

    # torch.rand call order inside training_losses+forward: (1) the
    # sp_timesteps overwrite t = rand*(c-c)+c (value irrelevant), (2) the
    # LabelEmbedder token_drop draw
    rand_queue = [torch.zeros(4, dtype=torch.float64), u_drop.clone()]

    def fake_rand(*size, **kw):
        return rand_queue.pop(0)

    from unittest import mock

    # timestep_embedding hard-codes float32 (lightningdit.py:122,125) which
    # breaks the all-double module; recast its output (values unchanged)
    orig_te = ld.TimestepEmbedder.timestep_embedding

    with mock.patch("torch.rand", side_effect=fake_rand), mock.patch(
        "torch.randn_like", side_effect=lambda t, **kw: x0.clone()
    ), mock.patch.object(
        ld.TimestepEmbedder, "timestep_embedding",
        staticmethod(lambda t, dim, max_period=10000:
                     orig_te(t, dim, max_period).double()),
    ):
        terms = transport.training_losses(
            model, x1, dict(y=y), sp_timesteps=(T_FIXED, T_FIXED)
        )
    assert not rand_queue, "unexpected torch.rand call pattern"
    loss = terms["loss"].mean() + terms["cos_loss"].mean()
    loss.backward()
    return (
        model.state_dict(),
        _grad_state_dict(model),
        (u_drop < DIT_DIMS["class_dropout_prob"]).numpy().astype(np.int32),
        x1.detach().numpy(),
        x0.numpy(),
        y.numpy(),
        float(loss.detach()),
    )


class TestDiTGradParity:
    def _jax_grads(self, dit_torch_grads, spec):
        sd, grads_sd, drop, x1, x0, y, ref_loss = dit_torch_grads
        sd_np = {k: v.detach().to(torch.float32).numpy() for k, v in sd.items()}
        params = torch_import.import_dit_state_dict(sd_np, spec)
        consts = DiTConsts(spec)
        transport = create_transport(
            path_type="Linear", prediction="velocity",
            use_cosine_loss=True, use_lognorm=True,
        )
        adaln = "fused" if spec.use_checkpoint else "xla"
        attn = "flash_rope" if spec.use_checkpoint else "xla"

        def loss_fn(p):
            def model_fn(xt, t, yk):
                return dit_forward(
                    p, spec, consts, xt, t, yk, train=True,
                    force_drop_ids=jnp.asarray(drop),
                    compute_dtype=jnp.float32, attn_impl=attn,
                    adaln_impl=adaln,
                )

            terms = transport.training_losses(
                model_fn, jax.random.key(0), jnp.asarray(x1), dict(yk=jnp.asarray(y)),
                sp_timesteps=(T_FIXED, T_FIXED), x0=jnp.asarray(x0),
            )
            return terms["loss"].mean() + terms["cos_loss"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=5e-4)
        grads_ref = torch_import.import_dit_state_dict(
            {k: v.numpy() for k, v in grads_sd.items()}, spec
        )
        return grads, grads_ref

    def test_xla_baseline_every_leaf(self, dit_torch_grads):
        spec = DiTSpec(**DIT_DIMS)
        grads, grads_ref = self._jax_grads(dit_torch_grads, spec)
        checked = _assert_tree_close(grads, grads_ref, tol=2e-3)
        # every trainable family must actually be compared
        for fam in ("x_embedder", "t_embedder", "y_embedder", "qkv", "proj",
                    "adaln", "w1", "w3", "norm1", "final_layer"):
            assert any(fam in c for c in checked), fam

    def test_shipped_config_flash_remat_fused_adaln(self, dit_torch_grads):
        """attn_impl=flash_rope + remat_policy=attn + train_adaln_impl=fused:
        the production train step's custom-VJP path (Pallas interpret mode)."""
        spec = DiTSpec(**DIT_DIMS, use_checkpoint=True, remat_policy="attn")
        grads, grads_ref = self._jax_grads(dit_torch_grads, spec)
        _assert_tree_close(grads, grads_ref, tol=2e-3)


# ---------------------------------------------------------------------------
# Optimizer-step parity: grads -> AdamW(+clip) -> EMA vs torch
# ---------------------------------------------------------------------------


class TestOptimizerStepParity:
    def test_adamw_clip_ema_step_matches_torch(self, dit_torch_grads):
        """Completes the train-path anchor chain: with gradient parity
        proven above, the remaining numerics are clip_by_global_norm +
        AdamW (train_accum.py:121: lr, weight_decay=0, betas=(0.9, b2)) +
        EMA 0.9999 (update_ema, train_accum.py:26-35). Two consecutive
        torch steps (exercising bias correction at t=1,2) must match
        optax through the importer mapping."""
        import optax

        from ldmae_tpu.train.train_dit import make_optimizer

        sd, grads_sd, *_ = dit_torch_grads
        lr, b2, clip = 1e-3, 0.95, 1.0

        model_params = {
            k: v.detach().clone().requires_grad_(True)
            for k, v in sd.items()
            # frozen pos_embed never reaches the optimizer
            if k != "pos_embed"
        }
        opt = torch.optim.AdamW(
            model_params.values(), lr=lr, weight_decay=0.0, betas=(0.9, b2)
        )
        ema_t = {k: v.detach().clone() for k, v in model_params.items()}
        for step in range(2):
            for k, p in model_params.items():
                g = grads_sd[k].double()
                p.grad = g * (1.0 + 0.5 * step)  # different grads per step
            torch.nn.utils.clip_grad_norm_(model_params.values(), clip)
            opt.step()
            with torch.no_grad():
                for k, p in model_params.items():
                    ema_t[k].mul_(0.9999).add_(p, alpha=1e-4)

        spec = DiTSpec(**DIT_DIMS)
        sd_np = {k: v.detach().to(torch.float32).numpy() for k, v in sd.items()}
        params = torch_import.import_dit_state_dict(sd_np, spec)
        grads = torch_import.import_dit_state_dict(
            {k: v.numpy() for k, v in grads_sd.items()}, spec
        )
        tx = make_optimizer(lr, b2, max_grad_norm=clip)
        opt_state = tx.init(params)
        ema = params
        for step in range(2):
            g = jax.tree_util.tree_map(lambda x: x * (1.0 + 0.5 * step), grads)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: 0.9999 * e + 1e-4 * p, ema, params
            )

        ref_params = torch_import.import_dit_state_dict(
            {k: (model_params[k] if k in model_params else torch.as_tensor(v)).detach().numpy()
             for k, v in sd.items()},
            spec,
        )
        ref_ema = torch_import.import_dit_state_dict(
            {k: (ema_t[k] if k in ema_t else torch.as_tensor(v)).detach().numpy()
             for k, v in sd.items()},
            spec,
        )
        _assert_tree_close(params, ref_params, tol=1e-5)
        _assert_tree_close(ema, ref_ema, tol=1e-5)


# ---------------------------------------------------------------------------
# VMAE train-step gradient parity
# ---------------------------------------------------------------------------

VMAE_DIMS = dict(
    img_size=16, patch_size=4, in_chans=3, embed_dim=24, depth=2, num_heads=4,
    decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4, latent_dim=4,
    no_cls=True, smooth_output=True,
)
MASK_RATIO = 0.25
VIS_RATIO = 0.75


def _build_ref_vmae(**over):
    vm = load_ref_vmae()
    torch.manual_seed(0)
    kw = dict(VMAE_DIMS, **over)
    model = vm.MaskedAutoencoderViT(norm_layer=torch.nn.LayerNorm, **kw)
    return vm, model


def _our_vmae_spec(**over):
    kw = dict(VMAE_DIMS, **over)
    kw.pop("in_chans", None)
    return VMAESpec(**kw)


class TestVMAEGradParityStage1:
    @pytest.mark.parametrize("fixed_std", [None, 1e-3])
    def test_forward_vanilla_every_leaf(self, fixed_std):
        vm, model = _build_ref_vmae(kl_loss_weight=1e-4, fixed_std=fixed_std)
        model.double().train()
        g = torch.Generator().manual_seed(3)
        x = torch.randn(2, 3, 16, 16, generator=g, dtype=torch.float64) * 0.5
        n_tok = (16 // 4) ** 2
        n_vis = int(n_tok * (1 - MASK_RATIO))  # posterior is over visible tokens
        mask_noise = torch.rand(2, n_tok, generator=g, dtype=torch.float64)
        eps = torch.randn(2, VMAE_DIMS["latent_dim"], n_vis, generator=g,
                          dtype=torch.float64)

        import sys
        from unittest import mock

        misc_mod = sys.modules[vm.DiagonalGaussianDistribution.__module__]
        with mock.patch("torch.rand", side_effect=lambda *s, **k: mask_noise.clone()), \
             mock.patch.object(
                 misc_mod, "randn_tensor",
                 side_effect=lambda shape, **k: eps.clone(),
             ):
            loss, *_ = model.forward_vanilla(
                x, mask_ratio=MASK_RATIO, visible_loss_ratio=VIS_RATIO
            )
        loss.backward()

        spec = _our_vmae_spec(kl_loss_weight=1e-4, fixed_std=fixed_std)
        consts = VMAEConsts(spec)
        sd = {k: v.detach().to(torch.float32).numpy()
              for k, v in model.state_dict().items()}
        params = torch_import.import_vmae_state_dict(sd, spec)

        def loss_fn(p):
            out = vmae_mod.forward_vanilla(
                p, spec, consts, jnp.asarray(x.numpy()), jax.random.key(0),
                mask_ratio=MASK_RATIO, visible_loss_ratio=VIS_RATIO,
                compute_dtype=jnp.float32,
                mask_noise=jnp.asarray(mask_noise.numpy()),
                latent_noise=jnp.asarray(eps.numpy()),
            )
            return out["loss"]

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), float(loss.detach()), rtol=5e-4)
        grads_ref = torch_import.import_vmae_state_dict(
            {k: v.numpy() for k, v in _grad_state_dict(model).items()}, spec
        )
        checked = _assert_tree_close(grads, grads_ref, tol=2e-3)
        for fam in ("patch_embed", "blocks", "to_latent", "from_latent",
                    "decoder_blocks", "decoder_pred", "mask_token"):
            assert any(fam in c for c in checked), fam


class TestVMAEGradParityLPIPS:
    def test_forward_vanilla_with_lpips_every_leaf(self):
        """Stage 1 with the perceptual term ACTIVE (the published recipe
        trains with LPIPS ratio 0.5/10.0 — train_ae.sh): gradients flow
        through VGG16 feature slices, channel-unit normalisation and the
        NetLin projections (models_mae.py:761-767). The torch anchor is the
        hand-built golden LPIPS from test_lpips_golden with shared weights
        on both sides, run in float64."""
        from test_lpips_golden import (
            _CHNS as CH,
            _SLICE_ENDS,
            _build_torch_features,
            _normalize_tensor,
            _scale,
            _torch_slices,
        )

        from ldmae_tpu.models.lpips import import_lpips_weights, lpips

        torch.manual_seed(0)
        feats = _build_torch_features().double().eval()
        for p in feats.parameters():
            p.requires_grad_(False)
        g = torch.Generator().manual_seed(7)
        lin_ws = [torch.rand((1, c, 1, 1), generator=g).double() * 0.1 for c in CH]

        def torch_lpips(a, b):
            o0 = _torch_slices(feats, _scale(a))
            o1 = _torch_slices(feats, _scale(b))
            val = 0.0
            for k in range(5):
                d = (_normalize_tensor(o0[k]) - _normalize_tensor(o1[k])) ** 2
                proj = torch.nn.functional.conv2d(d, lin_ws[k])
                val = val + proj.mean(dim=[2, 3], keepdim=True)
            return val  # (B, 1, 1, 1) like the reference LPIPS

        vm, model = _build_ref_vmae(
            kl_loss_weight=1e-4, fixed_std=1e-3,
            perceptual_loss=torch_lpips, perceptual_loss_ratio=0.5,
        )
        model.double().train()
        g = torch.Generator().manual_seed(3)
        x = torch.randn(2, 3, 16, 16, generator=g, dtype=torch.float64) * 0.5
        n_tok = (16 // 4) ** 2
        n_vis = int(n_tok * (1 - MASK_RATIO))
        mask_noise = torch.rand(2, n_tok, generator=g, dtype=torch.float64)
        eps = torch.randn(2, VMAE_DIMS["latent_dim"], n_vis, generator=g,
                          dtype=torch.float64)

        import sys
        from unittest import mock

        misc_mod = sys.modules[vm.DiagonalGaussianDistribution.__module__]
        with mock.patch("torch.rand", side_effect=lambda *s, **k: mask_noise.clone()), \
             mock.patch.object(
                 misc_mod, "randn_tensor",
                 side_effect=lambda shape, **k: eps.clone(),
             ):
            loss, *_ = model.forward_vanilla(
                x, mask_ratio=MASK_RATIO, visible_loss_ratio=VIS_RATIO
            )
        loss.backward()

        spec = _our_vmae_spec(kl_loss_weight=1e-4, fixed_std=1e-3,
                              perceptual_loss_ratio=0.5)
        consts = VMAEConsts(spec)
        sd = {k: v.detach().to(torch.float32).numpy()
              for k, v in model.state_dict().items()}
        params = torch_import.import_vmae_state_dict(sd, spec)
        vgg_sd = {f"features.{k}": v.to(torch.float32).numpy()
                  for k, v in feats.state_dict().items()}
        lin_sd = {f"lin{k}.model.1.weight": w.to(torch.float32).numpy()
                  for k, w in enumerate(lin_ws)}
        lp = import_lpips_weights(vgg_sd, lin_sd)

        def loss_fn(p):
            out = vmae_mod.forward_vanilla(
                p, spec, consts, jnp.asarray(x.numpy()), jax.random.key(0),
                mask_ratio=MASK_RATIO, visible_loss_ratio=VIS_RATIO,
                perceptual_loss_fn=lambda a, b: lpips(lp, a, b),
                compute_dtype=jnp.float32,
                mask_noise=jnp.asarray(mask_noise.numpy()),
                latent_noise=jnp.asarray(eps.numpy()),
            )
            return out["loss"]

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), float(loss.detach()), rtol=5e-4)
        grads_ref = torch_import.import_vmae_state_dict(
            {k: v.numpy() for k, v in _grad_state_dict(model).items()}, spec
        )
        checked = _assert_tree_close(grads, grads_ref, tol=2e-3)
        # the LPIPS gradient reaches the decoder output projection
        assert any("decoder_pred" in c for c in checked)


class TestGradualGradParity:
    def test_gradual_forward_vanilla_every_leaf(self):
        """The --gradual_resol stage-1 path (forward_encoder_with_mask with
        the token Downsample, decoder Upsample, mask-token reinsertion —
        models_mae.py:352-395,559-627): full train-loss gradients vs torch
        autograd in f64. Random draws are RECORDED from the torch side
        (shapes differ from the plain path: masking at the half-patch grid,
        posterior at the post-Downsample grid) and injected into ours."""
        import sys
        from unittest import mock

        from ldmae_tpu.models import vmae_variants as vv
        from ldmae_tpu.models.vmae import VMAESpec
        from ldmae_tpu.train.torch_import import import_vmae_state_dict_gradual

        vm = load_ref_vmae()
        torch.manual_seed(0)
        ref = vm.MaskedAutoencoderViT(
            img_size=32, patch_size=4, embed_dim=24, depth=2, num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            latent_dim=4, no_cls=True, gradual_resol=True, kl_loss_weight=1e-4,
            norm_layer=torch.nn.LayerNorm,
        ).double().train()
        g = torch.Generator().manual_seed(5)
        x = torch.randn(2, 3, 32, 32, generator=g, dtype=torch.float64) * 0.5

        orig_rand = torch.rand
        g2 = torch.Generator().manual_seed(11)
        rec = {}

        def rec_rand(*size, **kw):
            t = orig_rand(*size, generator=g2, dtype=torch.float64)
            rec["mask_noise"] = t.clone()
            return t

        def rec_eps(shape, **kw):
            t = torch.randn(*shape, generator=g2, dtype=torch.float64)
            rec["eps"] = t.clone()
            return t

        misc_mod = sys.modules[vm.DiagonalGaussianDistribution.__module__]
        with mock.patch("torch.rand", side_effect=rec_rand), \
             mock.patch.object(misc_mod, "randn_tensor", side_effect=rec_eps):
            loss, *_ = ref.forward_vanilla(
                x, mask_ratio=0.25, visible_loss_ratio=0.75
            )
        loss.backward()
        assert set(rec) == {"mask_noise", "eps"}

        # ctor halves patch_size for gradual (models_mae.py:310-312)
        spec = VMAESpec(
            img_size=32, patch_size=2, embed_dim=24, depth=2, num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            latent_dim=4, no_cls=True, kl_loss_weight=1e-4,
        )
        down = spec.depth // 2
        up = spec.decoder_depth - down
        sd = {k: v.detach().to(torch.float32).numpy()
              for k, v in ref.state_dict().items()}
        params = import_vmae_state_dict_gradual(sd, spec, down, up)
        consts = vv.GradualConsts(spec)

        def loss_fn(p):
            out = vv.forward_vanilla_gradual(
                p, spec, consts, jnp.asarray(x.numpy()), jax.random.key(0),
                downsample_after=down, upsample_after=up,
                mask_ratio=0.25, visible_loss_ratio=0.75,
                compute_dtype=jnp.float32,
                mask_noise=jnp.asarray(rec["mask_noise"].numpy()),
                latent_noise=jnp.asarray(rec["eps"].numpy()),
            )
            return out["loss"]

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), float(loss.detach()), rtol=5e-4)
        grads_ref = import_vmae_state_dict_gradual(
            {k: v.numpy() for k, v in _grad_state_dict(ref).items()}, spec,
            down, up,
        )
        checked = _assert_tree_close(grads, grads_ref, tol=2e-3)
        for fam in ("encoder_downsample", "decoder_upsample", "mask_token",
                    "decoder_pred", "to_latent"):
            assert any(fam in c for c in checked), fam


class TestVMAEGradParityStage3:
    def test_forward_ldmae_decoder_grads(self):
        """Stage 3 (tune_decoder): mask_ratio=0 routes the reference through
        the with-grad mode-encode (models_mae.py:700-702); parameters outside
        decoder*/from_latent are frozen (misc.py:148-163). Deterministic —
        posterior mode, no masking."""
        vm, model = _build_ref_vmae(kl_loss_weight=1e-4, ldmae_mode=True)
        model.double().train()
        # reference freeze (set_for_tuning_decoder semantics)
        model.mask_token = None
        for name, p in model.named_parameters():
            p.requires_grad = ("decoder" in name) or ("from_latent" in name)
        g = torch.Generator().manual_seed(4)
        x = torch.randn(2, 3, 16, 16, generator=g, dtype=torch.float64) * 0.5
        loss, *_ = model.forward_ldmae(x, mask_ratio=0.0)
        loss.backward()

        spec = _our_vmae_spec(kl_loss_weight=1e-4, ldmae_mode=True)
        consts = VMAEConsts(spec)
        sd = {k: v.detach().to(torch.float32).numpy()
              for k, v in model.state_dict().items()}
        params = torch_import.import_vmae_state_dict(sd, spec)

        def loss_fn(p):
            out = vmae_mod.forward_ldmae(
                p, spec, consts, jnp.asarray(x.numpy()),
                key=None, compute_dtype=jnp.float32,
            )
            return out["loss"]

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), float(loss.detach()), rtol=5e-4)
        grads_ref = torch_import.import_vmae_state_dict(
            {k: v.numpy() for k, v in _grad_state_dict(model).items()}, spec
        )
        # trainable set: exact match required; frozen set: both sides must
        # be exactly zero (torch: requires_grad=False -> None -> zeros;
        # ours: the stop_gradient at the latent)
        checked = _assert_tree_close(
            grads, grads_ref, tol=2e-3,
            only_paths=("decoder", "from_latent"),
        )
        assert any("decoder_pred" in c for c in checked)

        def assert_frozen(path, a):
            name = "/".join(str(getattr(q, "key", q)) for q in path)
            if "decoder" in name or "from_latent" in name:
                return
            assert float(jnp.abs(a).max()) == 0.0, (
                f"frozen leaf {name} received gradient"
            )

        jax.tree_util.tree_map_with_path(assert_frozen, grads)
