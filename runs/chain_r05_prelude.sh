#!/bin/bash
# Round-5 TPU prelude (single client at all times): waits for the axon relay,
# then runs the chip jobs that must precede the long dress rehearsal:
#   1. bf16 + w8a8 batch sweeps at 48/64 (the shapes that faulted the remote
#      compile service in round 4, VERDICT weak #1/#2)
#   2. dual-headline bench validation (bf16 + w8a8 legs)
#   3. dress-rehearsal prep: synthetic ImageFolder -> extract_features ->
#      train_dit 200 steps (production knobs) -> demo-free checkpoint
# Logs to runs/tpu_prelude_r05.log.
cd /root/repo
log=runs/tpu_prelude_r05.log
echo "=== prelude start $(date) ===" >> $log
for i in $(seq 1 24); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((4,4))))" >/dev/null 2>&1; then
    echo "TPU RESPONSIVE at $(date)" >> $log
    echo "=== sweep bf16 48 64 $(date) ===" >> $log
    timeout 1800 python perf_batch_sweep.py 250 48 64 >> $log 2>&1
    echo "=== sweep w8a8 48 64 $(date) ===" >> $log
    timeout 1800 python perf_batch_sweep.py 250 w8a8 48 64 >> $log 2>&1
    echo "=== bench dual validate $(date) ===" >> $log
    timeout 2400 python bench.py >> $log 2>&1
    echo "=== gen synth imgs $(date) ===" >> $log
    timeout 900 python runs/gen_synth_imgs.py output/dress_r05/imgs 2000 >> $log 2>&1
    echo "=== extract_features $(date) ===" >> $log
    timeout 1500 python -m ldmae_tpu.cli.extract_features \
      --config runs/dress_r05.yaml --out output/dress_r05/latents >> $log 2>&1
    echo "=== train_dit 200 steps $(date) ===" >> $log
    timeout 1800 python -m ldmae_tpu.cli.train_dit \
      --config runs/dress_r05.yaml >> $log 2>&1
    echo "=== prelude done $(date) ===" >> $log
    exit 0
  fi
  echo "probe $i failed $(date)" >> $log
  sleep 120
done
echo "prelude: TPU never recovered $(date)" >> $log
exit 1
