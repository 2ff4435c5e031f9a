#!/usr/bin/env bash
# Equivalent of /root/reference/LDMAE/run_inference.sh: sample 50k, build npz,
# run the full evaluator.
set -euo pipefail
CONFIG=${CONFIG:-configs/imagenet/lightningdit_b_vmae_f8d16.yaml}
python -m ldmae_tpu.cli.inference --config "$CONFIG" "$@"
