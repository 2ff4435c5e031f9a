"""MAE random masking, in-graph with jax.random.

Equivalent of /root/reference/VMAE/models_mae.py:475-500: per-sample shuffle
by argsort of uniform noise, keep the first ``L*(1-mask_ratio)`` tokens.
``len_keep`` must be static under jit, so ``mask_ratio`` is a Python float.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_masking(
    key: jax.Array, x: jnp.ndarray, mask_ratio: float, noise=None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (x_masked, mask, ids_restore).

    x: (N, L, D). mask: (N, L) with 0 = keep, 1 = removed.
    noise: optional (N, L) uniform draw override — deterministic injection
    for cross-framework parity tests (the torch side shares the same array).
    """
    n, length, d = x.shape
    len_keep = int(length * (1 - mask_ratio))

    if noise is None:
        noise = jax.random.uniform(key, (n, length))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)

    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)

    mask = jnp.ones((n, length), dtype=x.dtype)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def unshuffle_with_mask_tokens(
    x: jnp.ndarray, mask_token: jnp.ndarray, ids_restore: jnp.ndarray
) -> jnp.ndarray:
    """Append mask tokens and unshuffle (models_mae.py:533-540, no-cls path).

    x: (N, len_keep, D); mask_token: (D,) or (1,1,D); ids_restore: (N, L).
    """
    n, len_keep, d = x.shape
    length = ids_restore.shape[1]
    mask_tokens = jnp.broadcast_to(
        mask_token.reshape(1, 1, d).astype(x.dtype), (n, length - len_keep, d)
    )
    x_full = jnp.concatenate([x, mask_tokens], axis=1)
    return jnp.take_along_axis(x_full, ids_restore[:, :, None], axis=1)
