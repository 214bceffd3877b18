#!/usr/bin/env bash
# Linear-probe launcher (reference: linprobe.sh — 50 epochs, bs 1024,
# input 128, blr 0.1, LARS, wd 0).
# Usage: scripts/linprobe.sh <pretrained-ckpt> [extra args...]
set -euo pipefail

CKPT="${1:?usage: linprobe.sh <ckpt> [args...]}"; shift

python -m cross_scale_mae_tpu.cli.linprobe \
  --finetune "$CKPT" \
  --epochs 50 \
  --warmup_epochs 10 \
  --batch_size 1024 \
  --input_size 128 \
  --patch_size 16 \
  --blr 0.1 \
  --weight_decay 0.0 \
  "$@"
