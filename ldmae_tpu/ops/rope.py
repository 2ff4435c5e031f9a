"""EVA-02 style 2-D axial rotary position embedding.

Re-derivation of ``VisionRotaryEmbeddingFast``
(/root/reference/LDMAE/models/pos_embed.py:96-135) as precomputed cos/sin
tables + a pure apply function. Convention, which must match exactly for
PyTorch weight-import parity:

  * ``dim`` given to the table builder is ``head_dim // 2`` (one spatial axis
    gets half the head dim)
  * per-axis frequencies: ``1 / theta**(arange(0, dim, 2) / dim)`` → dim//2
    distinct frequencies, each repeated twice *interleaved* ("(n r)" with
    r=2), giving ``dim`` angles per axis
  * full table: angles for the row position over the first ``dim`` channels,
    angles for the column position over the last ``dim`` channels →
    (seq, seq, 2*dim) flattened to (seq*seq, head_dim)
  * rotate_half pairs channels as (x0,x1),(x2,x3),... and maps each pair to
    (-x1, x0) (interleaved-pair convention, NOT the Llama half-split)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_rope_table(
    half_head_dim: int,
    pt_seq_len: int,
    ft_seq_len: int | None = None,
    theta: float = 10000.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (cos, sin) each of shape (ft_seq_len**2, 2*half_head_dim) fp32."""
    dim = half_head_dim
    freqs = 1.0 / (
        theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim)
    )
    if ft_seq_len is None:
        ft_seq_len = pt_seq_len
    t = np.arange(ft_seq_len, dtype=np.float64) / ft_seq_len * pt_seq_len

    angles = np.einsum("n,f->nf", t, freqs)  # (S, dim//2)
    angles = np.repeat(angles, 2, axis=-1)  # interleaved repeat -> (S, dim)

    # broadcast-concat: rows give the first `dim` channels, cols the last.
    s = ft_seq_len
    full = np.concatenate(
        [
            np.broadcast_to(angles[:, None, :], (s, s, dim)),
            np.broadcast_to(angles[None, :, :], (s, s, dim)),
        ],
        axis=-1,
    ).reshape(s * s, 2 * dim)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def build_rope_table_2d(
    half_head_dim: int,
    pt_seq_len: int,
    ft_seq_len: int | None = None,
    theta: float = 10000.0,
) -> tuple[np.ndarray, np.ndarray]:
    """The non-fast ``VisionRotaryEmbedding`` variant
    (/root/reference/LDMAE/models/pos_embed.py:46-92): cos/sin kept on the
    2-D grid (S, S, head_dim) for partial-dim rotation via start_index.
    Unused by the production model; provided for API completeness."""
    cos, sin = build_rope_table(half_head_dim, pt_seq_len, ft_seq_len, theta)
    s = ft_seq_len or pt_seq_len
    return cos.reshape(s, s, -1), sin.reshape(s, s, -1)


def apply_rope_partial(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, start_index: int = 0
) -> jnp.ndarray:
    """Rotate only channels [start_index, start_index+rot_dim) like
    VisionRotaryEmbedding.forward (pos_embed.py:86-92)."""
    rot_dim = cos.shape[-1]
    left = x[..., :start_index]
    mid = x[..., start_index : start_index + rot_dim]
    right = x[..., start_index + rot_dim :]
    mid = apply_rope(mid, cos.reshape(-1, rot_dim), sin.reshape(-1, rot_dim))
    return jnp.concatenate([left, mid, right], axis=-1)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation: (x0,x1,x2,x3,...) -> (-x1,x0,-x3,x2,...)."""
    shape = x.shape
    x = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    x1 = x[..., 0]
    x2 = x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(shape)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: (..., N, head_dim); cos/sin: (N, head_dim). Computed in the dtype of
    x with fp32 tables broadcast — matches the reference applying fp32
    buffers to (possibly autocast) activations.
    """
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half(x) * sin


# ---------------------------------------------------------------------------
# Half-split (Llama-layout) fast path.
#
# Attention logits are invariant under any shared channel permutation of q
# and k, so permuting the q/k head-dim channels from EVA's interleaved pair
# layout [a0,b0,a1,b1,...] to half-split [a0,a1,...,b0,b1,...] — applied ONCE
# to the qkv weight columns (and qk-norm scales) — turns rotate_half's
# stride-2 shuffles into two contiguous slices. ~20% of the whole DiT forward
# on v5e came from the interleaved shuffles (see perf_ablate.py).
# ---------------------------------------------------------------------------


def rope_channel_permutation(head_dim: int) -> np.ndarray:
    """perm such that x_half[i] = x_interleaved[perm[i]]."""
    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )


def to_half_layout(table: np.ndarray) -> np.ndarray:
    """Permute a (N, head_dim) cos/sin table to half-split layout."""
    return table[:, rope_channel_permutation(table.shape[-1])]


def rotate_half_split(x: jnp.ndarray) -> jnp.ndarray:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """apply_rope for half-split-permuted channels/tables."""
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half_split(x) * sin
