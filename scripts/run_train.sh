#!/usr/bin/env bash
# Equivalent of /root/reference/LDMAE/run_train.sh (accelerate launch →
# jax SPMD; multi-host via jax.distributed env)
set -euo pipefail
CONFIG=${CONFIG:-configs/imagenet/lightningdit_b_vmae_f8d16.yaml}
python -m ldmae_tpu.cli.train_dit --config "$CONFIG" "$@"
