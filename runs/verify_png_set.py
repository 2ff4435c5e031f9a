"""Integrity check for a completed sampling set (dress rehearsal, round 5).

Asserts what the headline artifact claims: the sample dir holds exactly
N PNGs named 000000.png..N-1.png (the reference's save_npz stacking,
tools/save_npz.py:11-43, assumes a dense index range), no stray .tmp
files from the crash-atomic writer, and every file in a random sample
(plus every file around the resume boundaries) decodes to a full
256x256x3 image — a truncated or corrupt PNG would poison FID silently.

usage: python runs/verify_png_set.py SAMPLE_DIR [SAMPLE_N]
"""
import os
import sys

import numpy as np
from PIL import Image

sdir = sys.argv[1]
sample_n = int(sys.argv[2]) if len(sys.argv) > 2 else 512

names = os.listdir(sdir)
pngs = sorted(f for f in names if f.endswith(".png"))
tmps = [f for f in names if f.endswith(".tmp")]
n = len(pngs)
idx = sorted(int(f[:-4]) for f in pngs)
dense = idx == list(range(n))
print(f"{sdir}: {n} pngs, dense 0..{n-1}: {dense}, stray .tmp: {len(tmps)}")
assert dense, "index range has holes — save_npz would mis-stack"
assert not tmps, f"stray tmp files: {tmps[:5]}"

rng = np.random.default_rng(0)
check = set(rng.integers(0, n, size=min(sample_n, n)).tolist()) | {0, n - 1}

# every resume boundary (the likeliest corruption points): the run log
# prints "<K> resumed" on each batch line after a relaunch.
log = os.path.join(os.path.dirname(__file__), "dress_r05.log")
if os.path.exists(log):
    import re

    bounds = set()
    with open(log) as f:
        for line in f:
            m = re.search(r"(\d+) resumed", line)
            if m:
                bounds.add(int(m.group(1)))
    bounds.discard(0)
    for b in sorted(bounds):
        check.update(i for i in range(b - 3, b + 3) if 0 <= i < n)
    print(f"resume boundaries from log: {sorted(bounds)}")
check = sorted(check)
bad = []
shape = None
for i in check:
    p = os.path.join(sdir, f"{i:06d}.png")
    try:
        with Image.open(p) as im:
            im.verify()
        with Image.open(p) as im:
            a = np.asarray(im)
        if shape is None:
            shape = a.shape
        if a.shape != shape:
            bad.append((i, f"shape {a.shape} != {shape}"))
    except Exception as e:  # noqa: BLE001
        bad.append((i, repr(e)))
assert not bad, f"corrupt pngs: {bad[:5]}"
print(f"verified {len(check)} sampled files decode to {shape}; all good")
