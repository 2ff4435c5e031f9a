"""Build FID reference statistics from an image folder or arr_0 npz.

Produces the {mu, sigma, mu_s, sigma_s} npz consumed by the evaluator and
by inference's FID step — the role of ADM's published
VIRTUAL_imagenet256_labeled.npz (configs reference it at
data.fid_reference_file).

Usage:
    python -m ldmae_tpu.cli.fid_stats --input /path/to/val_images --out ref.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="image folder or arr_0 .npz")
    p.add_argument("--out", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument(
        "--spatial_tap", default="mixed_6_conv",
        help="sFID feature node: mixed_6_conv (exact ADM tap, default) or "
             "any Mixed_* block boundary for tap studies (EVAL_NOTES.md)",
    )
    a = p.parse_args()

    from ..eval.evaluator import Evaluator, compute_statistics

    ev = Evaluator(weights_path=a.weights, batch_size=a.batch_size,
                   spatial_tap=a.spatial_tap)
    pooled, spatial = ev.read_activations(a.input, limit=a.limit)
    st = compute_statistics(pooled)
    st_s = compute_statistics(spatial)
    np.savez(a.out, mu=st.mu, sigma=st.sigma, mu_s=st_s.mu, sigma_s=st_s.sigma)
    print(f"wrote {a.out}: mu {st.mu.shape}, sigma {st.sigma.shape}, "
          f"mu_s {st_s.mu.shape} from {len(pooled)} images")


if __name__ == "__main__":
    main()
