#!/usr/bin/env bash
# Finetuning launcher (reference: finetune.sh — input 64, patch 8, blr 1e-3,
# 100 epochs, layer decay 0.75).
# Usage: scripts/finetune.sh <pretrained-ckpt> [extra args...]
set -euo pipefail

CKPT="${1:?usage: finetune.sh <ckpt> [args...]}"; shift

python -m cross_scale_mae_tpu.cli.finetune \
  --finetune "$CKPT" \
  --input_size 64 \
  --patch_size 8 \
  --epochs 100 \
  --warmup_epochs 5 \
  --blr 1e-3 \
  --layer_decay 0.75 \
  --weight_decay 0.05 \
  --drop_path 0.1 \
  --mixup 0.8 \
  --cutmix 1.0 \
  --smoothing 0.1 \
  "$@"
