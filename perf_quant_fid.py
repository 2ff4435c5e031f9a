"""Distribution-level int8 (w8a8) sampling gate on the real TPU
(VERDICT r3 next #6).

The round-3 gate was same-noise PSNR only. This run bounds the
DISTRIBUTION shift: >=1024 images sampled from the same perturbed-random
B/1 checkpoint with the SAME noise/label stream in bf16 and w8a8
(perf_quant.build, production sampling config), then the self-consistent
FID/sFID between the two sets under the deterministic random-weight
Inception backbone — compared against the same-distribution floor (the
bf16 set split in halves). A second bf16 set with an independent noise
stream calibrates what a genuine (non-quantization) resample shift looks
like. Also saves side-by-side per-class grids.

Without the published pt_inception weights the absolute FID is not
comparable to papers, but a quantization-induced distribution shift would
move random-weight features too (EVAL_NOTES.md 'FID-proxy' rationale).

Run: python perf_quant_fid.py [n_images] [steps]   (real TPU via axon)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf_quant import build

BATCH = 36


def sample_set(fn, bundle, n, key_base, seed_labels):
    rng = np.random.default_rng(seed_labels)
    out = []
    t0 = time.time()
    n_batches = (n + BATCH - 1) // BATCH
    for i in range(n_batches):
        y = jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32)
        imgs = np.asarray(fn(bundle, jax.random.key(key_base + i), y))
        out.append(imgs)
        if (i + 1) % 5 == 0:
            done = (i + 1) * BATCH
            print(f"  {done}/{n_batches * BATCH} ({done / (time.time() - t0):.2f} img/s)",
                  flush=True)
    return np.concatenate(out)[:n]


def report(sets, n):
    """FID/sFID/P&R gate over {bf16, w8a8, bf16_b} uint8 image sets."""
    from ldmae_tpu.eval.evaluator import Evaluator, compute_statistics

    ev = Evaluator(batch_size=64)  # random-weight backbone (no weights file)
    acts = {k: ev.compute_activations(v) for k, v in sets.items()}

    def fid_pair(a, b):
        sa, sb = compute_statistics(a[0]), compute_statistics(b[0])
        ssa, ssb = compute_statistics(a[1]), compute_statistics(b[1])
        return sa.frechet_distance(sb), ssa.frechet_distance(ssb)

    half = n // 2
    floor_f, floor_s = fid_pair(
        (acts["bf16"][0][:half], acts["bf16"][1][:half]),
        (acts["bf16"][0][half:], acts["bf16"][1][half:]),
    )
    gate_f, gate_s = fid_pair(acts["bf16"], acts["w8a8"])
    resample_f, resample_s = fid_pair(acts["bf16"], acts["bf16_b"])
    prec, rec = ev.compute_prec_recall(acts["bf16"][0], acts["w8a8"][0])

    print(f"FID floor (bf16 {half}v{half} split):      {floor_f:.5f}  sFID {floor_s:.5f}")
    print(f"FID bf16 vs w8a8 (same noise, {n}v{n}):  {gate_f:.5f}  sFID {gate_s:.5f}")
    print(f"FID bf16 vs bf16' (indep noise, {n}v{n}): {resample_f:.5f}  sFID {resample_s:.5f}")
    print(f"precision/recall bf16 vs w8a8: {prec:.4f}/{rec:.4f}")
    verdict = "PASS" if gate_f <= max(2 * floor_f, resample_f) else "FAIL"
    print(f"GATE {verdict}: w8a8 FID {gate_f:.5f} vs "
          f"max(2x floor {2 * floor_f:.5f}, resample {resample_f:.5f})")
    return verdict


def main(n=1024, steps=250):
    os.makedirs("runs", exist_ok=True)
    sets = {}
    for mode, key_base, seed in [
        ("bf16", 10_000, 7),
        ("w8a8", 10_000, 7),     # SAME keys + labels as bf16
        ("bf16_b", 50_000, 8),   # independent noise: resample-shift scale
    ]:
        cache = f"runs/quant_fid_{mode}_{n}_{steps}.npy"
        if os.path.exists(cache):
            sets[mode] = np.load(cache)
            print(f"{mode}: loaded {cache}", flush=True)
            continue
        quant = "w8a8" if mode == "w8a8" else None
        fn, bundle = build(BATCH, steps, quant)
        print(f"sampling {mode}: {n} images...", flush=True)
        t0 = time.time()
        sets[mode] = sample_set(fn, bundle, n, key_base, seed)
        print(f"{mode}: {n / (time.time() - t0):.3f} img/s incl. compile", flush=True)
        np.save(cache, sets[mode])
        del fn, bundle

    # side-by-side grid (first 8 of each set; same noise/labels per column)
    from PIL import Image

    rows = [np.concatenate(list(sets[name][:8]), axis=1) for name in ("bf16", "w8a8")]
    Image.fromarray(np.concatenate(rows, axis=0)).save("runs/quant_fid_grid_r04.png")
    print("grid -> runs/quant_fid_grid_r04.png")
    report(sets, n)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    main(n, steps)
