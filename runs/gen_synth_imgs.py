"""Generate a synthetic ImageFolder for the dress rehearsal's extraction leg
(no dataset ships in the image): N JPEGs of varied ~400-600 px sizes across
10 class folders, structured content (gradients + shapes + noise) so the
ADM center-crop / encode path sees non-degenerate statistics.

Run: python runs/gen_synth_imgs.py <out_dir> [n_images]
"""

import os
import sys

import numpy as np
from PIL import Image


def main(out: str, n: int = 2000, classes: int = 10):
    rng = np.random.default_rng(7)
    for i in range(n):
        c = i % classes
        d = os.path.join(out, f"class_{c:03d}")
        os.makedirs(d, exist_ok=True)
        h = int(rng.integers(380, 620))
        w = int(rng.integers(380, 620))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack(
            [
                128 + 100 * np.sin(xx / rng.uniform(20, 80) + c),
                128 + 100 * np.cos(yy / rng.uniform(20, 80) + i * 0.1),
                128 + 100 * np.sin((xx + yy) / rng.uniform(30, 120)),
            ],
            axis=-1,
        )
        noise = rng.normal(0, 25, (h, w, 3))
        img = np.clip(base + noise, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"{i:05d}.jpg"), quality=90)
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{n}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2000)
