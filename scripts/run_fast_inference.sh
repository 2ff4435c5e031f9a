#!/usr/bin/env bash
# Equivalent of /root/reference/LDMAE/run_fast_inference.sh: 8-image demo grid.
set -euo pipefail
CONFIG=${CONFIG:-configs/imagenet/lightningdit_b_vmae_f8d16.yaml}
python -m ldmae_tpu.cli.inference --config "$CONFIG" --demo "$@"
