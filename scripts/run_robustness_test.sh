#!/usr/bin/env bash
# Equivalent of /root/reference/LDMAE/run_robustness_test.sh: tokenizer
# reconstruction under latent noise ε ∈ {0, .01, .05, .1, .2, .3}.
set -euo pipefail
# accept the config as the first positional arg (reference invocation:
# `bash run_*.sh configs/...yaml`) or via $CONFIG
if [[ $# -ge 1 && "$1" == *.yaml ]]; then CONFIG="$1"; shift; fi
CONFIG=${CONFIG:-configs/imagenet/lightningdit_b_vmae_f8d16.yaml}
DATA=${DATA:-/data/dataset/imagenet/1K_dataset/val}
python -m ldmae_tpu.cli.evaluate_tokenizer --config "$CONFIG" \
    --data_path "$DATA" --epsilon 0 0.01 0.05 0.1 0.2 0.3 "$@"
