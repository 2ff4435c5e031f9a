#!/bin/bash
# Dress-rehearsal evaluation leg (run AFTER the sampling watchdog stops):
#   1. save_npz on the full completed set (the reference's headline artifact
#      format, tools/save_npz.py:11-43) — exercises npz memory behavior at N
#   2. even/odd half-split of the PNGs (both halves span the whole run)
#   3. ADM full_report (FID/sFID/IS/P&R) between the halves — with random
#      inception weights the VALUES are floor-level by construction; the
#      run proves the stack at scale
#   4. eval/fid (pytorch-fid stack) on the same halves — the two FID stacks
#      must agree on the same sets
# Logs to runs/dress_eval_r05.log.
cd /root/repo
export PYTHONUNBUFFERED=1
log=runs/dress_eval_r05.log
echo "=== dress eval start $(date) ===" >> $log

sdir=$(ls -d output/dress_r05/train/*/ 2>/dev/null | grep -v checkpoints | head -1)
sdir=${sdir%/}
n=$(ls "$sdir" | grep -c '\.png$')
echo "sample dir: $sdir ($n pngs)" >> $log

echo "=== [1] save_npz full set $(date) ===" >> $log
# peak-RSS reported by save_npz itself (resource.getrusage); /usr/bin/time
# is not installed in this image
timeout 3600 python -m ldmae_tpu.eval.save_npz \
  --sample_dir "$sdir" --num "$n" --out output/dress_r05/samples_${n}.npz >> $log 2>&1

echo "=== [2] even/odd split $(date) ===" >> $log
python - "$sdir" >> $log 2>&1 <<'EOF'
import os, sys
sdir = sys.argv[1]
pngs = sorted(f for f in os.listdir(sdir) if f.endswith(".png"))
for name, sel in [("even", 0), ("odd", 1)]:
    d = os.path.join("output/dress_r05", f"half_{name}")
    os.makedirs(d, exist_ok=True)
    k = 0
    for i, f in enumerate(pngs):
        if i % 2 == sel:
            dst = os.path.join(d, f"{k:06d}.png"); k += 1
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(os.path.join(sdir, f)), dst)
    print(name, k, "pngs")
EOF

echo "=== [3] ADM full_report halves $(date) ===" >> $log
timeout 7200 python -m ldmae_tpu.cli.evaluate \
  output/dress_r05/half_even output/dress_r05/half_odd >> $log 2>&1

echo "=== [4] eval/fid halves (pytorch-fid stack) $(date) ===" >> $log
timeout 7200 python -m ldmae_tpu.cli.evaluate --fid \
  output/dress_r05/half_even output/dress_r05/half_odd >> $log 2>&1

echo "=== dress eval done $(date) ===" >> $log
