"""VMAE tokenizer training: jitted SPMD train step, 3-stage flow.

TPU-native equivalent of /root/reference/VMAE/main_pretrain.py +
engine_pretrain.py:

  * stage 1 ("pretrain"): masked forward_vanilla with KL bottleneck,
    visible/masked MSE split + optional LPIPS
  * stage 2: positional-embedding resize for a new resolution — free here
    (sin-cos tables are recomputed constants; pe_reset.py is subsumed)
  * stage 3 ("tune_decoder"): mask_ratio 0, full round-trip pixel MSE+LPIPS,
    everything frozen except decoder* and from_latent (misc.py:148-163)

Optimizer matches main_pretrain.py:258-259: AdamW(lr, betas=(0.9, 0.95))
with timm-style weight-decay groups (no decay on ndim<2 leaves), per-step
half-cosine LR with warmup computed at fractional epochs
(lr_sched.adjust_learning_rate), lr scaled as blr·eff_batch/256.
bf16 compute replaces the AMP GradScaler (no loss scaling needed on TPU).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..models.vmae import (
    VMAEConsts,
    VMAESpec,
    forward_ldmae,
    forward_vanilla,
)
from .state import TrainState

Params = Any


def cosine_lr(
    base_lr: float,
    min_lr: float,
    warmup_epochs: float,
    total_epochs: float,
    fixed_lr: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """epoch (fractional) -> lr; matches lr_sched.adjust_learning_rate."""

    def fn(epoch):
        if fixed_lr:
            return jnp.asarray(base_lr)
        warm = base_lr * epoch / max(warmup_epochs, 1e-8)
        prog = (epoch - warmup_epochs) / max(total_epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return fn


def _decay_mask(params: Params) -> Params:
    """timm param_groups_weight_decay: decay only ndim >= 2 leaves."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def _trainable_mask(params: Params, tune_decoder: bool) -> Params:
    """Stage-3 freeze: only decoder* and from_latent train
    (misc.py:153-157 matches on parameter-name substrings)."""
    if not tune_decoder:
        return jax.tree_util.tree_map(lambda _: True, params)

    def mark(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return ("decoder" in str(top)) or ("from_latent" in str(top))

    return jax.tree_util.tree_map_with_path(mark, params)


def make_vmae_optimizer(
    params: Params,
    steps_per_epoch: int,
    *,
    base_lr: float,
    min_lr: float = 0.0,
    warmup_epochs: float = 40,
    total_epochs: float = 400,
    weight_decay: float = 0.05,
    fixed_lr: bool = False,
    tune_decoder: bool = False,
) -> optax.GradientTransformation:
    lr_fn = cosine_lr(base_lr, min_lr, warmup_epochs, total_epochs, fixed_lr)

    def schedule(step):
        return lr_fn(step / steps_per_epoch)

    tx = optax.chain(
        optax.adamw(
            schedule,
            b1=0.9,
            b2=0.95,
            weight_decay=weight_decay,
            mask=_decay_mask(params),
        ),
    )
    trainable = _trainable_mask(params, tune_decoder)
    if tune_decoder:
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: t, trainable),
        )
    return tx


def make_vmae_train_step(
    spec: VMAESpec,
    consts: VMAEConsts,
    tx: optax.GradientTransformation,
    *,
    mask_ratio: float = 0.75,
    visible_loss_ratio: float = 0.5,
    tune_decoder: bool = False,
    perceptual_loss_fn=None,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    gradual=None,
    grad_accum: int = 1,
):
    """Train step (no EMA — the reference VMAE trainer keeps none).

    gradual: optional (downsample_after, upsample_after) — routes stage 1
    through the gradual_resol forward (main_pretrain.py --gradual_resol;
    params from vmae_variants.init_gradual_params).
    grad_accum: micro-batch gradient accumulation via lax.scan, matching the
    reference's --accum_iter semantics (engine_pretrain.py:72-76: backward
    each micro-batch, step once per accum_iter with loss/accum scaling).
    batch["x"] is (A, m, H, W, 3) when grad_accum > 1; flat (B, ...) for 1.
    Returns (state, metrics) with the reference's meter set
    (loss/vis/mask/kl/p_loss — engine_pretrain.py:80-105) plus a NaN flag
    replacing the reference's hard process abort (engine_pretrain.py:68-70):
    non-finite losses skip the update so training can continue/alert."""

    def loss_fn(params, x, key):
        if tune_decoder:
            out = forward_ldmae(
                params, spec, consts, x, key=key,
                perceptual_loss_fn=perceptual_loss_fn,
                compute_dtype=compute_dtype, attn_impl=attn_impl,
            )
            aux = {
                "vis_loss": out["vis_loss"],
                "mask_loss": jnp.zeros(()),
                "kl_loss": jnp.zeros(()),
                "p_loss": out["p_loss"],
            }
        elif gradual is not None:
            from ..models.vmae_variants import forward_vanilla_gradual

            out = forward_vanilla_gradual(
                params, spec, consts, x, key,
                downsample_after=gradual[0], upsample_after=gradual[1],
                mask_ratio=mask_ratio,
                visible_loss_ratio=visible_loss_ratio,
                perceptual_loss_fn=perceptual_loss_fn,
                compute_dtype=compute_dtype, attn_impl=attn_impl,
            )
            aux = {
                "vis_loss": out["vis_loss"],
                "mask_loss": out["mask_loss"],
                "kl_loss": out["kl_loss"],
                "p_loss": out["p_loss"],
            }
        else:
            out = forward_vanilla(
                params, spec, consts, x, key,
                mask_ratio=mask_ratio,
                visible_loss_ratio=visible_loss_ratio,
                perceptual_loss_fn=perceptual_loss_fn,
                compute_dtype=compute_dtype, attn_impl=attn_impl,
            )
            aux = {
                "vis_loss": out["vis_loss"],
                "mask_loss": out["mask_loss"],
                "kl_loss": out["kl_loss"],
                "p_loss": out["p_loss"],
            }
        return out["loss"], aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    aux_keys = ("vis_loss", "mask_loss", "kl_loss", "p_loss")

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        key = jax.random.fold_in(rng, state.step)
        x = batch["x"]
        if x.ndim == 4:
            x = x[None]
        a = x.shape[0]
        assert a == grad_accum, (
            f"batch leading (accumulation) dim {a} != grad_accum={grad_accum}"
        )
        keys = jax.random.split(key, a)

        def micro(carry, inp):
            grads_acc, loss_acc, aux_acc = carry
            xm, km = inp
            if xm.dtype == jnp.uint8:
                # uint8 pixels: 4x less host->device traffic than
                # pre-normalized fp32; identical arithmetic on device
                from ..data.images import normalize_uint8_images

                xm = normalize_uint8_images(xm)
            (l, a_), g = grad_fn(state.params, xm, km)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
            aux_acc = {k: aux_acc[k] + a_[k] for k in aux_keys}
            return (grads_acc, loss_acc + l, aux_acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zero_aux = {k: jnp.zeros(()) for k in aux_keys}
        (grads, loss, aux), _ = jax.lax.scan(
            micro, (zero_grads, jnp.zeros(()), zero_aux), (x, keys)
        )
        grads = jax.tree_util.tree_map(lambda g: g / a, grads)
        loss = loss / a
        aux = {k: v / a for k, v in aux.items()}
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # A non-finite loss must be a true no-op (reference aborts instead,
        # engine_pretrain.py:68-70): zeroed grads alone would still apply
        # AdamW weight decay and stale momenta, so gate params AND opt_state.
        select = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        params = select(new_params, state.params)
        opt_state = select(new_opt_state, state.opt_state)
        metrics = dict(aux, loss=loss, loss_finite=finite)
        return (
            TrainState(state.step + 1, params, state.ema_params, opt_state),
            metrics,
        )

    return train_step
