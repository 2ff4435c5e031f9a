"""Diagonal Gaussian posterior used by the VMAE variational bottleneck.

Functional equivalent of ``DiagonalGaussianDistribution``
(/root/reference/VMAE/util/misc.py:74-133 and the LDMAE tokenizer copy).
Parameters are chunked into (mean, logvar) along ``axis`` (the reference
always chunks dim=1 — channels for (B,C,h,w) moments, the latent dim for
(B,D,HW) layouts). logvar clamped to [-30, 20].

KL variants (both exist in the reference — careful):
  * VMAE training (VMAE/util/misc.py:123-125):   0.5·Σ(var − 1 − logvar)
    (the mean² term is deliberately commented out)
  * tokenizer copy (LDMAE/tokenizer/util/misc.py): 0.5·Σ(mean² + var − 1 − logvar)
  * fixed_std target: 0.5·Σ(var/fvar − 1 − logvar + log fvar)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    @property
    def std(self) -> jnp.ndarray:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jnp.ndarray:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array, noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """noise: optional N(0,1) draw override (deterministic injection for
        cross-framework parity tests)."""
        eps = (
            jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
            if noise is None
            else noise.astype(self.mean.dtype)
        )
        return self.mean + self.std * eps

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(
        self,
        include_mean: bool = False,
        fixed_std: Optional[float] = None,
    ) -> jnp.ndarray:
        """Per-sample KL, summed over all non-batch dims."""
        reduce_axes = tuple(range(1, self.mean.ndim))
        if fixed_std is not None:
            fixed_var = jnp.asarray(fixed_std, dtype=jnp.float32) ** 2
            term = self.var / fixed_var - 1.0 - self.logvar + jnp.log(fixed_var)
        elif include_mean:
            term = jnp.square(self.mean) + self.var - 1.0 - self.logvar
        else:
            term = self.var - 1.0 - self.logvar
        return 0.5 * jnp.sum(term, axis=reduce_axes)


def diagonal_gaussian(parameters: jnp.ndarray, axis: int = 1) -> DiagonalGaussian:
    mean, logvar = jnp.split(parameters, 2, axis=axis)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return DiagonalGaussian(mean=mean, logvar=logvar)
