#!/usr/bin/env bash
# 3-stage VMAE tokenizer training — equivalent of /root/reference/VMAE/train_ae.sh.
# Stage boundaries and hyperparameters mirror train_ae.sh:26-106; the pe_reset
# stage (lines 50-70) is unnecessary here: positional tables are recomputed
# constants at any resolution.
set -euo pipefail
DATA=${DATA:-/data/dataset/imagenet/1K_dataset/train}
OUT=${OUT:-output/vmae_f8d16}

# Stage 1: masked pretrain (mask 0.25, KL 1e-6, smooth output, 400 epochs)
python -m ldmae_tpu.cli.train_vmae \
    --model mae_for_ldmae_f8d16_prev \
    --data_path "$DATA" \
    --output_dir "$OUT/stage1" \
    --input_size 256 \
    --batch_size 128 --accum_iter 2 \
    --epochs 400 --warmup_epochs 40 \
    --blr 1e-4 \
    --mask_ratio 0.25 \
    --no_cls --smooth_output \
    --kl_loss_weight 1e-6 \
    "$@"

# Stage 2 (pe_reset): no-op — resolution changes recompute the sin-cos tables.

# Stage 3: decoder finetune at full res (mask 0, LPIPS, encoder frozen)
python -m ldmae_tpu.cli.train_vmae \
    --model mae_for_ldmae_f8d16_prev \
    --data_path "$DATA" \
    --output_dir "$OUT/stage3" \
    --input_size 256 \
    --batch_size 16 --accum_iter 16 \
    --epochs 10 --warmup_epochs 0 \
    --blr 1e-5 \
    --mask_ratio 0.0 \
    --no_cls --smooth_output \
    --kl_loss_weight 0.0 \
    --tune_decoder --use_lpips \
    --resume "$OUT/stage1" \
    "$@"
