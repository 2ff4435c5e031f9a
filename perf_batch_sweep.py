"""Sampling batch sweep on the real TPU (PERF.md round-2 lever #1).

Re-tries the batch sizes that previously faulted in the remote compile
service (48/64) and measures end-to-end production-sampling throughput
(250-step Euler + CFG + VMAE decode, bf16) per batch size. One TPU client;
run only via the serialized chain (never alongside another client).

Run: python perf_batch_sweep.py [steps] [batches...]
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


def measure(batch, steps, iters=3, quant=None):
    """Compile + time the full sampling pipeline at this batch size."""
    try:
        fn, bundle = build(batch, steps, quant)
    except Exception as e:  # noqa: BLE001 — report and move on to next size
        print(f"b={batch}: BUILD FAILED {type(e).__name__}: {e}", flush=True)
        return None
    rng = np.random.default_rng(batch)
    try:
        t0 = time.time()
        y = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
        np.asarray(fn(bundle, jax.random.key(0), y))  # compile + fetch
        print(f"b={batch}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for i in range(iters):
            y = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
            np.asarray(fn(bundle, jax.random.key(i + 1), y))  # fetch syncs
        dt = (time.time() - t0) / iters
    except Exception as e:  # noqa: BLE001 — HBM overflow / compile-service fault
        print(f"b={batch}: RUN FAILED {type(e).__name__}: {e}", flush=True)
        return None
    rate = batch / dt
    print(f"b={batch}: {dt:.2f} s/batch  {rate:.3f} img/s/chip", flush=True)
    return rate


def main():
    # usage: perf_batch_sweep.py [steps] [w8|w8a8] [batches...]
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    rest = sys.argv[2:]
    quant = None
    if rest and not rest[0].isdigit():
        quant = rest.pop(0)
        if quant not in ("w8", "w8a8"):
            raise SystemExit(f"unknown quant mode {quant!r} (want w8|w8a8)")
    bad = [b for b in rest if not b.isdigit()]
    if bad:
        # a mode after a batch would otherwise be silently dropped and the
        # sweep would run (and get labeled) bf16
        raise SystemExit(
            f"non-numeric batch args {bad} — the quant mode must come "
            "before the batch list: perf_batch_sweep.py [steps] [w8|w8a8] [batches...]"
        )
    batches = [int(b) for b in rest] or [36, 40, 48, 64]
    results = {}
    for b in batches:
        r = measure(b, steps, quant=quant)
        if r is not None:
            results[b] = r
    best = max(results, key=results.get) if results else None
    print(f"sweep done ({quant or 'bf16'}): {results}  best=b{best}", flush=True)


if __name__ == "__main__":
    main()
