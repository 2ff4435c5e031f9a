#!/usr/bin/env bash
# Equivalent of /root/reference/LDMAE/run_train.sh (accelerate launch →
# jax SPMD; multi-host via jax.distributed env)
set -euo pipefail
# accept the config as the first positional arg (reference invocation:
# `bash run_*.sh configs/...yaml`) or via $CONFIG
if [[ $# -ge 1 && "$1" == *.yaml ]]; then CONFIG="$1"; shift; fi
CONFIG=${CONFIG:-configs/imagenet/lightningdit_b_vmae_f8d16.yaml}
python -m ldmae_tpu.cli.train_dit --config "$CONFIG" "$@"
