"""LightningDiT training: one jitted SPMD train step.

TPU-native equivalent of /root/reference/LDMAE/train_accum.py's hot loop
(lines 203-246): everything — logit-normal t sampling, path interpolation,
forward, loss (+ optional cosine term), backward, AdamW, EMA — is one XLA
program per step. Gradient accumulation is a ``lax.scan`` over microbatches
inside the step (grads averaged like the reference's loss/accum division);
the data-parallel all-reduce is inserted by XLA from the batch sharding.

Optimizer matches train_accum.py:121: AdamW(lr, weight_decay=0,
betas=(0.9, beta2)) with optional global-norm clipping; EMA decay 0.9999
applied after each optimizer step (update_ema, train_accum.py:26-35).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import LDMAEConfig
from ..models.lightningdit import DiTConsts, DiTSpec, dit_forward
from ..transport.transport import Transport
from .state import TrainState

Params = Any


def make_optimizer(
    lr: float, beta2: float = 0.95, max_grad_norm: Optional[float] = None
) -> optax.GradientTransformation:
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(lr, b1=0.9, b2=beta2, weight_decay=0.0))
    return optax.chain(*chain)


def make_train_step(
    spec: DiTSpec,
    consts: DiTConsts,
    transport: Transport,
    tx: optax.GradientTransformation,
    *,
    grad_accum: int = 1,
    ema_decay: float = 0.9999,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    rope_layout: str = "interleaved",
    adaln_impl: str = "xla",
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array], Tuple[TrainState, Dict]]:
    """Build the train step.

    batch: {"x": (A, m, C, H, W), "y": (A, m)} with A = grad_accum. For
    A == 1 a flat (B, C, H, W) / (B,) batch is also accepted.
    """

    def loss_fn(params: Params, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array):
        k_transport, k_drop = jax.random.split(key)

        def model_fn(xt, t, y):
            return dit_forward(
                params,
                spec,
                consts,
                xt,
                t,
                y,
                train=True,
                label_drop_key=k_drop,
                compute_dtype=compute_dtype,
                attn_impl=attn_impl,
                rope_layout=rope_layout,
                adaln_impl=adaln_impl,
            )

        terms = transport.training_losses(model_fn, k_transport, x, dict(y=y))
        mse = terms["loss"].mean()
        if "cos_loss" in terms:
            loss = terms["cos_loss"].mean() + mse
        else:
            loss = mse
        # aux = the TOTAL optimized loss (the reference's running_loss
        # accumulates it, train_accum.py:255-259); logging only the MSE term
        # would hide the cosine term from the curves
        return loss, loss

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        x, y = batch["x"], batch["y"]
        if x.ndim == 4:
            x = x[None]
            y = y[None]
        a = x.shape[0]
        assert a == grad_accum, (
            f"batch leading (accumulation) dim {a} != grad_accum={grad_accum}"
        )
        key = jax.random.fold_in(rng, state.step)
        keys = jax.random.split(key, a)

        def micro(carry, inp):
            grads_acc, mse_acc = carry
            xm, ym, km = inp
            grads, mse = grad_fn(state.params, xm, ym, km)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, mse_acc + mse), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, mse_sum), _ = jax.lax.scan(
            micro, (zero_grads, jnp.zeros(())), (x, y, keys)
        )
        grads = jax.tree_util.tree_map(lambda g: g / a, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params,
            params,
        )
        metrics = {
            "loss": mse_sum / a,  # mean TOTAL loss over the micro-batches
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(state.step + 1, params, ema, opt_state), metrics

    return train_step


def build_from_config(config: LDMAEConfig, key: jax.Array):
    """Construct (spec, consts, params, transport, tx, train_step) from a
    reference-layout config (train_accum.py:79-121 semantics, including
    class_dropout_prob=0 for unconditional/1-class runs)."""
    from ..models.lightningdit import dit_spec, init_dit_params
    from ..transport.transport import create_transport

    m = config.model
    d = config.data
    latent_size = d.image_size // config.vae.downsample_ratio
    spec = dit_spec(
        m.model_type,
        input_size=latent_size,
        in_channels=m.in_chans,
        num_classes=d.num_classes,
        class_dropout_prob=0.0 if d.num_classes == 1 else 0.1,
        learn_sigma=m.learn_sigma,
        use_qknorm=m.use_qknorm,
        use_swiglu=m.use_swiglu,
        use_rope=m.use_rope,
        use_rmsnorm=m.use_rmsnorm,
        wo_shift=m.wo_shift,
        use_checkpoint=config.train.use_checkpoint or m.use_checkpoint,
        remat_policy=getattr(m, "remat_policy", "full"),
        scan_unroll=getattr(m, "scan_unroll", 1),
    )
    consts = DiTConsts(spec)
    params = init_dit_params(key, spec)

    t = config.transport
    transport = create_transport(
        path_type=t.path_type,
        prediction=t.prediction,
        loss_weight=t.loss_weight,
        train_eps=t.train_eps,
        sample_eps=t.sample_eps,
        use_cosine_loss=t.use_cosine_loss,
        use_lognorm=t.use_lognorm,
        partitial_train=t.partitial_train,
        partial_ratio=t.partial_ratio,
        shift_lg=t.shift_lg,
    )
    tx = make_optimizer(
        config.optimizer.lr, config.optimizer.beta2, config.optimizer.max_grad_norm
    )
    compute_dtype = jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
    step_fn = make_train_step(
        spec,
        consts,
        transport,
        tx,
        grad_accum=config.train.gradient_accumulation_steps,
        compute_dtype=compute_dtype,
        attn_impl=config.parallel.train_attention_impl,
        rope_layout=config.parallel.rope_layout,
        adaln_impl=getattr(config.parallel, "train_adaln_impl", "xla"),
    )
    return spec, consts, params, transport, tx, step_fn


def evaluate_step(
    spec: DiTSpec,
    consts: DiTConsts,
    transport: Transport,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    rope_layout: str = "interleaved",
) -> jnp.ndarray:
    """Validation loss at fixed t-range (0,1) — the reference references an
    undefined evaluate() (train_accum.py:291); this is the working version."""

    def model_fn(xt, t, y):
        return dit_forward(
            params, spec, consts, xt, t, y, train=False,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
            rope_layout=rope_layout,
        )

    terms = transport.training_losses(
        model_fn, key, batch["x"], dict(y=batch["y"]), sp_timesteps=(0.0, 1.0)
    )
    return terms["loss"].mean()
