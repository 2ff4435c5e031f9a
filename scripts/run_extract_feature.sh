#!/usr/bin/env bash
# Equivalent of /root/reference/LDMAE/run_extract_feature.sh
set -euo pipefail
CONFIG=${CONFIG:-configs/imagenet/lightningdit_b_vmae_f8d16.yaml}
python -m ldmae_tpu.cli.extract_features --config "$CONFIG" "$@"
