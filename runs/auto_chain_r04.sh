#!/bin/bash
# Waits for the axon relay to recover, then runs the round-4 TPU jobs
# back-to-back (single client at all times). Logs to runs/tpu_chain1_r04.log.
cd /root/repo
log=runs/tpu_chain1_r04.log
echo "=== auto-chain start $(date) ===" >> $log
for i in $(seq 1 48); do
  if timeout 60 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((4,4))))" >/dev/null 2>&1; then
    echo "TPU RESPONSIVE at $(date)" >> $log
    echo "=== perf_extract $(date) ===" >> $log
    timeout 1500 python perf_extract.py 64 4 >> $log 2>&1
    echo "=== quant_fid smoke n=36 steps=8 $(date) ===" >> $log
    timeout 1800 python perf_quant_fid.py 36 8 >> $log 2>&1
    rm -f runs/quant_fid_*_36_8.npy
    echo "=== quant_fid full n=1024 steps=250 $(date) ===" >> $log
    timeout 5400 python perf_quant_fid.py 1024 250 >> $log 2>&1
    echo "=== bench $(date) ===" >> $log
    timeout 1800 python bench.py >> $log 2>&1
    echo "=== auto-chain done $(date) ===" >> $log
    exit 0
  fi
  echo "probe $i failed $(date)" >> $log
  sleep 530
done
echo "auto-chain: TPU never recovered $(date)" >> $log
exit 1
