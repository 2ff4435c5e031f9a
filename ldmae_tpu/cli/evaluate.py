"""Generation-metric CLIs.

``python -m ldmae_tpu.cli.evaluate ref_batch.npz sample_batch.npz`` — the ADM
evaluator entry point (tools/evaluator.py:69-130): FID, sFID, Inception
Score, Precision, Recall.

``python -m ldmae_tpu.cli.evaluate --fid path1 path2 [--sp_len N]`` — the
pytorch-fid two-path entry point (tools/calculate_fid.py:651+).
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs=2, help="reference batch/stats, sample batch")
    p.add_argument("--fid", action="store_true", help="plain FID only (pytorch-fid style)")
    p.add_argument("--sp_len", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--weights", default=None, help="pt_inception weights path")
    p.add_argument("--ref_stats", default=None, help="npz with mu/sigma/mu_s/sigma_s")
    p.add_argument(
        "--spatial_tap", default="mixed_6_conv",
        help="sFID feature node: mixed_6_conv (exact ADM tap, default) or "
             "any Mixed_* block boundary for tap studies (EVAL_NOTES.md)",
    )
    a = p.parse_args()

    if a.fid:
        from ..eval.fid import calculate_fid_given_paths
        from ..models.inception import default_feature_fn

        fid = calculate_fid_given_paths(
            a.paths,
            feature_fn=default_feature_fn(a.weights),
            batch_size=a.batch_size,
            sp_len=a.sp_len,
        )
        print(f"FID: {fid:.6f}")
        return

    from ..eval.evaluator import Evaluator

    ev = Evaluator(weights_path=a.weights, batch_size=a.batch_size,
                   spatial_tap=a.spatial_tap)
    report = ev.full_report(
        a.paths[0], a.paths[1], ref_stats_npz=a.ref_stats, limit=a.sp_len
    )
    # matches the ADM evaluator's printed block (evaluator.py:69-75)
    print("computing/reading reference batch statistics... done")
    print(json.dumps({k: float(v) for k, v in report.items()}, indent=2))


if __name__ == "__main__":
    main()
