"""Export an Orbax DiT checkpoint as a reference-format torch .pt.

Applies the inverse q/k rope permutation when the checkpoint was trained in
the fast half-split layout (recorded in the saved config yaml), so the
exported state dict is canonical EVA-interleaved like the reference's.

Usage:
    python -m ldmae_tpu.cli.export_torch --config cfg.yaml \
        --ckpt output/.../checkpoints/0100000 --out 0100000.pt
"""

from __future__ import annotations

import argparse
import os

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True, help="Orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .pt path")
    a = p.parse_args()

    from ..core.config import LDMAEConfig
    from ..models.lightningdit import permute_qk_for_half_rope
    from ..train.torch_export import save_dit_torch_checkpoint
    from ..train.train_dit import build_from_config

    config = LDMAEConfig.from_yaml(a.config)
    spec, *_ = build_from_config(config, jax.random.key(0))

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as c:
        restored = c.restore(os.path.abspath(a.ckpt))
    params, ema = restored["params"], restored["ema"]

    # the on-disk ckpt config takes precedence for the layout
    ckpt_cfg = os.path.join(
        os.path.dirname(os.path.abspath(a.ckpt)),
        os.path.basename(a.ckpt) + ".config.yaml",
    )
    layout = config.parallel.rope_layout
    if os.path.exists(ckpt_cfg):
        import yaml

        saved = yaml.safe_load(open(ckpt_cfg)) or {}
        layout = saved.get("parallel", {}).get("rope_layout", layout)

    if layout == "half":
        params = permute_qk_for_half_rope(params, spec, inverse=True)
        ema = permute_qk_for_half_rope(ema, spec, inverse=True)
        print("applied inverse half-rope permutation (canonical layout out)")

    save_dit_torch_checkpoint(a.out, params, ema, spec, config=config.to_dict())
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
