"""Train state + Orbax checkpointing.

Checkpoint layout mirrors the reference's DiT format semantically
({model, ema, opt, config, step} — train_accum.py:275-284) but stores a JAX
pytree via Orbax. Resume picks the largest step present (the reference picks
the largest *file size*, train_accum.py:174-177 — we use step number, which
is what that heuristic approximates).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Any
    ema_params: Any
    opt_state: Any


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # real copy, not an alias — donated train steps must not see the
        # same buffer twice (params and ema share storage otherwise)
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        opt_state=tx.init(params),
    )


# ---------------------------------------------------------------------------
# Orbax save / restore
# ---------------------------------------------------------------------------


def _ckpt_dir(base: str) -> str:
    return os.path.abspath(os.path.join(base, "checkpoints"))


def save_checkpoint(base_dir: str, state: TrainState, config: Optional[Dict] = None) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.join(_ckpt_dir(base_dir), f"{step:07d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "step": step,
                "params": state.params,
                "ema": state.ema_params,
                "opt_state": state.opt_state,
            },
            force=True,
        )
    if config is not None:
        import yaml

        with open(os.path.join(_ckpt_dir(base_dir), f"{step:07d}.config.yaml"), "w") as f:
            yaml.safe_dump(config, f, sort_keys=False)
    return path


def list_checkpoints(base_dir: str) -> list:
    d = _ckpt_dir(base_dir)
    if not os.path.isdir(d):
        return []
    steps = []
    for name in os.listdir(d):
        if re.fullmatch(r"\d{7}", name) and os.path.isdir(os.path.join(d, name)):
            steps.append(int(name))
    return sorted(steps)


def restore_checkpoint(
    base_dir: str, state: TrainState, step: Optional[int] = None
) -> Optional[TrainState]:
    """Restore the latest (or given) checkpoint into the structure of
    ``state``. Returns None when no checkpoint exists."""
    import orbax.checkpoint as ocp

    steps = list_checkpoints(base_dir)
    if not steps:
        return None
    step = steps[-1] if step is None else step
    path = os.path.join(_ckpt_dir(base_dir), f"{step:07d}")
    template = {
        "step": int(state.step),
        "params": state.params,
        "ema": state.ema_params,
        "opt_state": state.opt_state,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    return TrainState(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        ema_params=restored["ema"],
        opt_state=restored["opt_state"],
    )
