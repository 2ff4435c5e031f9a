"""Extraction-driver perf split on the real TPU (VERDICT r3 next #8).

The full pipeline run measured extract_features at 29.6 img/s end-to-end
(runs/pipeline_full_r03.log). This probe separates:

  * device-only encode rate: the jitted encode_both (unflipped+flipped
    moments in one doubled batch) on device-resident uint8 pixels, input
    varied per iteration to defeat the axon dispatch dedup, host fetch as
    the sync point
  * host decode rate: PIL PNG decode + ADM center-crop on this host's
    single CPU core (the extraction transform, no device involved)
  * tunnel transfer: uint8 pixels host->device at the measured link rate

Run: python perf_extract.py [batch] [iters]   (real TPU via axon)
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

from ldmae_tpu.data.images import normalize_uint8_images
from ldmae_tpu.models.tokenizers import build_tokenizer_fns


def device_encode_rate(batch=64, iters=4, image_size=256):
    # param init is hundreds of small eager ops — on the remote-compiled
    # axon backend each is its own remote compile (PERF.md "Driver startup");
    # prep on the local CPU backend like the drivers do
    import contextlib

    try:
        prep_ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        prep_ctx = contextlib.nullcontext()
    with prep_ctx:
        tok = build_tokenizer_fns("vmae_f8d16", "", image_size)
    params = tok.params

    @jax.jit
    def encode_both(imgs_u8):
        imgs = normalize_uint8_images(imgs_u8)
        both = jnp.concatenate([imgs, imgs[..., ::-1]], axis=0)
        moments = tok.encode_moments(params, both, compute_dtype=jnp.bfloat16)
        half = moments.shape[0] // 2
        return moments[:half], moments[half:]

    rng = np.random.default_rng(0)
    # NHWC uint8 — the layout the extraction dataset ships and
    # normalize_uint8_images expects
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (batch, image_size, image_size, 3), dtype=np.uint8))
    )
    t0 = time.time()
    m, mf = encode_both(x)
    float(jnp.sum(m.astype(jnp.float32)))
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(iters):
        # vary the input (roll) so the axon client can't dedup the dispatch
        xi = jnp.roll(x, i + 1, axis=0)
        t0 = time.time()
        m, mf = encode_both(xi)
        float(jnp.sum(m.astype(jnp.float32)))  # host fetch = hard sync
        times.append(time.time() - t0)
    best = min(times)
    print(f"device encode_both: batch={batch} times={['%.3f' % t for t in times]}"
          f" -> {batch / best:.1f} img/s (x2 flip variants internally)")
    return batch / best


def host_decode_rate(n=128, image_size=256):
    """PIL decode + ADM center-crop throughput on the 1-core host."""
    import io

    from PIL import Image

    from ldmae_tpu.data.images import center_crop_arr

    rng = np.random.default_rng(1)
    blobs = []
    for _ in range(8):  # 8 distinct PNGs re-decoded n/8 times each
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (320, 320, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        blobs.append(buf.getvalue())
    t0 = time.time()
    for i in range(n):
        img = Image.open(io.BytesIO(blobs[i % 8])).convert("RGB")
        arr = center_crop_arr(img, image_size)
        np.asarray(arr)
    dt = time.time() - t0
    print(f"host decode+crop: {n / dt:.1f} img/s (single core)")
    return n / dt


def tunnel_rate(batch=64, iters=3, image_size=256):
    rng = np.random.default_rng(2)
    times = []
    for i in range(iters):
        x = rng.integers(0, 255, (batch, image_size, image_size, 3), dtype=np.uint8)
        t0 = time.time()
        jax.device_put(x).block_until_ready()
        times.append(time.time() - t0)
    mb = batch * 3 * image_size * image_size / 1e6
    best = min(times)
    print(f"host->device uint8: {mb / best:.1f} MB/s -> {batch / best:.1f} img/s at 256^2")
    return batch / best


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dev = device_encode_rate(batch, iters)
    host = host_decode_rate()
    tun = tunnel_rate(batch)
    bound = 1.0 / (1.0 / host + 1.0 / tun)
    print(f"SUMMARY device={dev:.1f} host_decode={host:.1f} tunnel={tun:.1f} "
          f"host_pipeline_bound={bound:.1f} img/s")
