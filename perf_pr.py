"""Benchmark the device-side precision/recall kernels at production scale
(50k×2048 pooled Inception features — the reference runs this on GPU TF,
tools/evaluator.py:448-470). Records wall-clock for manifold radii (k-NN over
the full 50k×50k distance matrix) and the containment pass.

Usage: python perf_pr.py [n] [dim]
"""

import sys
import time

import numpy as np

from ldmae_tpu.eval.evaluator import ManifoldEstimator


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((n, dim)).astype(np.float32)
    sample = rng.standard_normal((n, dim)).astype(np.float32) * 1.05

    est = ManifoldEstimator(row_batch_size=10000, col_batch_size=10000)

    t0 = time.time()
    r1 = est.manifold_radii(ref)
    t1 = time.time()
    r2 = est.manifold_radii(sample)
    t2 = time.time()
    pr = est.evaluate_pr(ref, r1, sample, r2)
    t3 = time.time()

    print(f"n={n} dim={dim}")
    print(f"radii(ref):    {t1 - t0:7.2f}s   (incl. jit compile)")
    print(f"radii(sample): {t2 - t1:7.2f}s")
    print(f"evaluate_pr:   {t3 - t2:7.2f}s")
    print(f"total:         {t3 - t0:7.2f}s")
    print(f"precision={pr[0][0]:.4f} recall={pr[1][0]:.4f}")


if __name__ == "__main__":
    main()
