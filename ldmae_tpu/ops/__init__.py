from .sincos import (
    get_2d_sincos_pos_embed,
    get_1d_sincos_pos_embed_from_grid,
    timestep_embedding_freqs,
)
from .rope import build_rope_table, apply_rope, rotate_half
from .norms import rms_norm, layer_norm
from .linear import dense, mlp_gelu, swiglu_ffn, modulate
from .patchify import patchify, unpatchify, patch_embed
from .masking import random_masking, unshuffle_with_mask_tokens
from .gaussian import DiagonalGaussian, diagonal_gaussian
from .attention import multi_head_attention, sdpa

__all__ = [
    "get_2d_sincos_pos_embed",
    "get_1d_sincos_pos_embed_from_grid",
    "timestep_embedding_freqs",
    "build_rope_table",
    "apply_rope",
    "rotate_half",
    "rms_norm",
    "layer_norm",
    "dense",
    "mlp_gelu",
    "swiglu_ffn",
    "modulate",
    "patchify",
    "unpatchify",
    "patch_embed",
    "random_masking",
    "unshuffle_with_mask_tokens",
    "DiagonalGaussian",
    "diagonal_gaussian",
    "multi_head_attention",
    "sdpa",
]
