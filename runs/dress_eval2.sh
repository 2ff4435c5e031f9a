#!/bin/bash
# Final dress-rehearsal evaluation chain (round 5, 50k target). Waits for
# the sampling watchdog (runs/dress_watchdog.sh) to finish, then runs the
# reference's full headline-artifact chain on the completed set:
#   1. save_npz on the full set (tools/save_npz.py:11-43 format)
#   2. fresh even/odd half-split (indices over the FINAL sorted set —
#      the round-1 half dirs were built from the 17,316 subset and are
#      stale for the larger N)
#   3. ADM full_report (FID/sFID/IS/P&R) between the halves — P&R is
#      O(N^2) in the half size, measured 17 min at 8.6k halves, so the
#      timeout is 4 h for ~25k halves
#   4. eval/fid (pytorch-fid stack) on the same halves
# Logs to runs/dress_eval2_r05.log. Safe to re-run; survives the
# builder session dying (nohup'd, self-contained).
cd /root/repo
export PYTHONUNBUFFERED=1
log=runs/dress_eval2_r05.log
echo "=== eval2 chain start $(date) ===" >> $log

# wait for the sampling watchdog to exit (deadline or rc=0 completion)
wpid=$(cat /tmp/watchdog3.pid 2>/dev/null)
while [ -n "$wpid" ] && kill -0 "$wpid" 2>/dev/null; do
  sleep 120
done
echo "=== sampling watchdog done $(date) ===" >> $log
sleep 30  # let the async png writer drain

sdir=$(ls -d output/dress_r05/train/*/ 2>/dev/null | grep -v checkpoints | head -1)
sdir=${sdir%/}
n=$(ls "$sdir" | grep -c '\.png$')
echo "sample dir: $sdir ($n pngs)" >> $log

echo "=== [0] set integrity check $(date) ===" >> $log
timeout 1800 python runs/verify_png_set.py "$sdir" >> $log 2>&1
echo "=== [0] done rc=$? $(date) ===" >> $log

echo "=== [1] save_npz full set $(date) ===" >> $log
timeout 3600 python -m ldmae_tpu.eval.save_npz \
  --sample_dir "$sdir" --num "$n" --out output/dress_r05/samples_${n}.npz >> $log 2>&1

echo "=== [2] fresh even/odd split $(date) ===" >> $log
rm -rf output/dress_r05/half_even_final output/dress_r05/half_odd_final
python - "$sdir" >> $log 2>&1 <<'EOF'
import os, sys
sdir = sys.argv[1]
pngs = sorted(f for f in os.listdir(sdir) if f.endswith(".png"))
for name, sel in [("even", 0), ("odd", 1)]:
    d = os.path.join("output/dress_r05", f"half_{name}_final")
    os.makedirs(d, exist_ok=True)
    k = 0
    for i, f in enumerate(pngs):
        if i % 2 == sel:
            os.symlink(os.path.abspath(os.path.join(sdir, f)),
                       os.path.join(d, f"{k:06d}.png")); k += 1
    print(name, k, "pngs")
EOF

echo "=== [3] ADM full_report halves $(date) ===" >> $log
timeout 14400 python -m ldmae_tpu.cli.evaluate \
  output/dress_r05/half_even_final output/dress_r05/half_odd_final >> $log 2>&1
echo "=== [3] done rc=$? $(date) ===" >> $log

echo "=== [4] eval/fid halves (pytorch-fid stack) $(date) ===" >> $log
timeout 14400 python -m ldmae_tpu.cli.evaluate --fid \
  output/dress_r05/half_even_final output/dress_r05/half_odd_final >> $log 2>&1
echo "=== [4] done rc=$? $(date) ===" >> $log

echo "=== eval2 chain done $(date) ===" >> $log
