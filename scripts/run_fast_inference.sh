#!/usr/bin/env bash
# Equivalent of /root/reference/LDMAE/run_fast_inference.sh: 8-image demo grid.
set -euo pipefail
# accept the config as the first positional arg (reference invocation:
# `bash run_*.sh configs/...yaml`) or via $CONFIG
if [[ $# -ge 1 && "$1" == *.yaml ]]; then CONFIG="$1"; shift; fi
CONFIG=${CONFIG:-configs/imagenet/lightningdit_b_vmae_f8d16.yaml}
python -m ldmae_tpu.cli.inference --config "$CONFIG" --demo "$@"
