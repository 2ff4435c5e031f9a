#!/bin/bash
# Round-5 dress-rehearsal watchdog: keeps cli.inference running toward the
# 50k-PNG target, surviving relay outages and process crashes via the
# batch-level resume (cli/inference.py do_sample). A deadline epoch is read
# from runs/dress_deadline on EVERY loop so the budget can be adjusted (or
# the run stopped) without killing mid-batch. Logs to runs/dress_r05.log.
cd /root/repo
log=runs/dress_r05.log
echo "=== watchdog start $(date) ===" >> $log
attempt=0
while true; do
  deadline=$(cat runs/dress_deadline 2>/dev/null || echo 0)
  now=$(date +%s)
  remaining=$((deadline - now))
  if [ "$remaining" -le 60 ]; then
    echo "=== deadline reached $(date) ===" >> $log
    break
  fi
  attempt=$((attempt + 1))
  echo "=== inference attempt $attempt ($(date), ${remaining}s left) ===" >> $log
  timeout "$remaining" python -m ldmae_tpu.cli.inference \
    --config runs/dress_r05.yaml --skip_fid >> $log 2>&1 &
  echo $! > /tmp/dress_inference.pid
  wait $!
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== inference COMPLETE rc=0 $(date) ===" >> $log
    break
  fi
  echo "=== inference exited rc=$rc $(date); retrying after probe ===" >> $log
  # wait for the relay to come back before relaunching
  for i in $(seq 1 60); do
    deadline=$(cat runs/dress_deadline 2>/dev/null || echo 0)
    if [ "$(date +%s)" -ge "$deadline" ]; then break; fi
    if timeout 120 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((4,4))))" >/dev/null 2>&1; then
      break
    fi
    sleep 120
  done
done
n=$(ls output/dress_r05/train/*/ 2>/dev/null | grep -c '\.png$')
echo "=== watchdog done $(date): ~$n pngs ===" >> $log
