"""Stack sample PNGs into an arr_0 npz for the ADM evaluator.

Equivalent of /root/reference/LDMAE/tools/save_npz.py:11-43.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_npz(sample_dir: str, out_path: Optional[str] = None, num: int = 50000) -> str:
    from PIL import Image

    files = sorted(
        f for f in os.listdir(sample_dir) if f.endswith(".png")
    )[:num]
    assert len(files) >= num, f"{sample_dir}: {len(files)} < {num} pngs"
    arr = np.stack(
        [np.asarray(Image.open(os.path.join(sample_dir, f)).convert("RGB")) for f in files]
    )
    out_path = out_path or (sample_dir.rstrip("/") + ".npz")
    np.savez(out_path, arr_0=arr)
    return out_path


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--sample_dir", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--num", type=int, default=50000)
    a = p.parse_args()
    print(save_npz(a.sample_dir, a.out, a.num))


if __name__ == "__main__":
    main()
