#!/bin/bash
# Self-healing dress-rehearsal launcher: waits for the axon relay, runs the
# remaining prep (extract_features with retry, train_dit 200 steps), then
# hands off to the long-sampling watchdog (runs/dress_watchdog.sh).
# Logs to runs/tpu_prep2_r05.log.
cd /root/repo
export PYTHONUNBUFFERED=1
log=runs/tpu_prep2_r05.log
echo "=== launch chain start $(date) ===" >> $log

probe() { timeout 120 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((4,4))))" >/dev/null 2>&1; }

wait_tpu() {
  for i in $(seq 1 60); do
    if probe; then echo "TPU RESPONSIVE at $(date)" >> $log; return 0; fi
    echo "probe $i failed $(date)" >> $log
    sleep 120
  done
  return 1
}

# --- extraction (retry up to 3x; a wedged attempt gets killed by timeout) --
if ! ls output/dress_r05/latents/*.safetensors >/dev/null 2>&1; then
  for try in 1 2 3; do
    wait_tpu || { echo "relay never recovered" >> $log; exit 1; }
    echo "=== extract_features try $try $(date) ===" >> $log
    timeout 1500 python -m ldmae_tpu.cli.extract_features \
      --config runs/dress_r05.yaml --out output/dress_r05/latents >> $log 2>&1
    if ls output/dress_r05/latents/*.safetensors >/dev/null 2>&1 \
       && [ -f output/dress_r05/latents/latents_stats.pt ]; then
      echo "=== extraction complete $(date) ===" >> $log
      break
    fi
    # wipe the stats cache too: a timeout-truncated or leftover
    # latents_stats.pt would be LOADED (not recomputed) by the retry and
    # silently mis-normalize every latent downstream
    rm -f output/dress_r05/latents/*.safetensors \
          output/dress_r05/latents/latents_stats.pt
  done
fi
ls output/dress_r05/latents/*.safetensors >/dev/null 2>&1 || { echo "extraction failed 3x $(date)" >> $log; exit 1; }

# --- 200-step training at production knobs -> checkpoints/0000200 ---------
if [ ! -d output/dress_r05/train/checkpoints/0000200 ]; then
  for try in 1 2 3; do
    wait_tpu || exit 1
    echo "=== train_dit try $try $(date) ===" >> $log
    timeout 1800 python -m ldmae_tpu.cli.train_dit --config runs/dress_r05.yaml >> $log 2>&1
    [ -d output/dress_r05/train/checkpoints/0000200 ] && break
  done
fi
[ -d output/dress_r05/train/checkpoints/0000200 ] || { echo "train failed 3x $(date)" >> $log; exit 1; }
echo "=== prep complete, launching watchdog $(date) ===" >> $log
exec bash runs/dress_watchdog.sh
