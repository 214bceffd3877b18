#!/usr/bin/env bash
# Single-host pretraining launcher (reference: train.sh).
# Usage: scripts/train.sh <model> <loss> [extra args...]
#   e.g. scripts/train.sh mae_vit_base_MsLdCeCd mse --train_path data/train.csv
set -euo pipefail

MODEL="${1:-mae_vit_base_MsLdCeCd}"; shift || true
LOSS="${1:-mse}"; shift || true

# Canonical hyperparams (train.sh:3-7): 400 epochs, bs 512, input 128, patch 16.
python -m cross_scale_mae_tpu.cli.pretrain \
  --model "$MODEL" \
  --loss "$LOSS" \
  --epochs 400 \
  --warmup_epochs 40 \
  --batch_size 512 \
  --input_size 128 \
  --patch_size 16 \
  --mask_ratio 0.75 \
  --blr 5e-5 \
  --weight_decay 0.05 \
  "$@"
