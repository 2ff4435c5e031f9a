#!/usr/bin/env bash
# 3-stage VMAE tokenizer training — the published recipe of
# /root/reference/VMAE/train_ae.sh:26-106, stage for stage:
#   Stage 1: masked pretrain at 128² (mask 0.25, KL 1e-6, fixed_std 1e-3,
#            LPIPS 0.5, visible_loss_ratio 0.75, 400 epochs, warmup 10,
#            wd 0.05, eff. batch 128×8×2 = 2048).
#   Stage 2: PE reset 128²→256² on CHECKPOINT-90 (train_ae.sh:66 — the paper
#            hands the epoch-90 checkpoint to stage 3, not the latest).
#            Our sin-cos tables are recomputed constants at any resolution,
#            so pe_reset is an identity here; cli.pe_reset exists for torch
#            checkpoint interop.
#   Stage 3: decoder finetune at 256² from checkpoint-90 (mask 0, LPIPS 10.0,
#            visible_loss_ratio 0.5, encoder frozen, save every epoch).
set -euo pipefail
DATA=${DATA:-/data/dataset/imagenet/1K_dataset/train}
OUT=${OUT:-output/vmae_f8d16}

# Stage 1: VMAE pretraining (128x128) — train_ae.sh:26-46
python -m ldmae_tpu.cli.train_vmae \
    --model mae_for_ldmae_f8d16_prev \
    --data_path "$DATA" \
    --output_dir "$OUT/stage1" \
    --input_size 128 \
    --batch_size 128 \
    --accum_iter 2 \
    --epochs 400 \
    --warmup_epochs 10 \
    --blr 1.0e-4 \
    --weight_decay 0.05 \
    --mask_ratio 0.25 \
    --visible_loss_ratio 0.75 \
    --no_cls \
    --smooth_output \
    --perceptual_loss_ratio 0.5 \
    --fixed_std 1e-3 \
    --kl_loss_weight 1e-6 \
    "$@"

# Stage 2 (pe_reset, train_ae.sh:64-66): targets checkpoint-90; a no-op for
# our recomputed positional tables (input_size drives them directly).

# Stage 3: decoder tuning (256x256) from checkpoint-90 — train_ae.sh:84-106
python -m ldmae_tpu.cli.train_vmae \
    --model mae_for_ldmae_f8d16_prev \
    --data_path "$DATA" \
    --output_dir "$OUT/stage3" \
    --input_size 256 \
    --batch_size 16 \
    --accum_iter 16 \
    --epochs 10 \
    --save_epochs 1 \
    --warmup_epochs 0 \
    --blr 1.0e-5 \
    --weight_decay 0.05 \
    --mask_ratio 0.0 \
    --visible_loss_ratio 0.5 \
    --no_cls \
    --smooth_output \
    --perceptual_loss_ratio 10.0 \
    --kl_loss_weight 0.0 \
    --tune_decoder \
    --resume "$OUT/stage1/checkpoints/checkpoint-90" \
    "$@"
