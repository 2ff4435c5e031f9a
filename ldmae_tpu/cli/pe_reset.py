"""Positional-embedding resize for torch checkpoints (pe_reset equivalent).

In ldmae_tpu the positional tables are constants recomputed per resolution,
so our own pipeline never needs this. It exists for torch-checkpoint
interop: rewrite the ``pos_embed`` / ``decoder_pos_embed`` buffers of a
reference ``.pth`` bilinearly for a new resolution and save ``*_pe.pth`` —
what /root/reference/VMAE/pe_reset.py does, with its shipped bugs fixed
(broken ``models_mae.util.pos_embed`` import at pe_reset.py:17 and the
``--chkpt_dir`` vs ``--ckpt_dir`` flag mismatch with train_ae.sh:65).

resize matches VMAE/util/misc.py:488-499 (bilinear, align_corners=False).

Usage:
    python -m ldmae_tpu.cli.pe_reset --ckpt_dir in.pth --save_dir out_pe.pth \
        --input_size 256 --patch_size 8
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def resize_pos_embed_np(pos_embed: np.ndarray, new_size: int) -> np.ndarray:
    """(1, HW, D) -> (1, new_size², D), bilinear (align_corners=False)."""
    import jax
    import jax.numpy as jnp

    _, hw, d = pos_embed.shape
    h = int(round(hw**0.5))
    assert h * h == hw
    grid = jnp.asarray(pos_embed).reshape(1, h, h, d)
    out = jax.image.resize(
        grid, (1, new_size, new_size, d), method="bilinear", antialias=False
    )
    return np.asarray(out.reshape(1, new_size * new_size, d))


def pe_reset(ckpt_path: str, save_path: str, input_size: int, patch_size: int) -> str:
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    new_size = input_size // patch_size
    for key in ("pos_embed", "decoder_pos_embed"):
        if key in sd:
            old = sd[key].numpy()
            print(f"{key}: {tuple(old.shape)} -> grid {new_size}x{new_size}")
            sd[key] = torch.from_numpy(resize_pos_embed_np(old, new_size))
    torch.save(ckpt, save_path)
    return save_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True, help="input checkpoint (.pth)")
    p.add_argument("--save_dir", default=None, help="output path (default *_pe.pth)")
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--patch_size", type=int, default=8)
    a = p.parse_args()
    if a.save_dir:
        out = a.save_dir
    else:
        stem, ext = os.path.splitext(a.ckpt_dir)
        out = f"{stem}_pe{ext or '.pth'}"
    if os.path.abspath(out) == os.path.abspath(a.ckpt_dir):
        p.error("output path equals the input checkpoint; pass --save_dir")
    print(pe_reset(a.ckpt_dir, out, a.input_size, a.patch_size))


if __name__ == "__main__":
    main()
