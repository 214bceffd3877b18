#!/usr/bin/env bash
# Multi-host pretraining launcher (reference: train_distributed.sh's torchrun).
#
# JAX is single-controller: run THIS script once per host with:
#   COORDINATOR=<host0-ip>:8476 NUM_PROCESSES=<n_hosts> PROCESS_ID=<rank> \
#     scripts/train_distributed.sh <model> <loss> [extra args...]
# On a single TPU board (all chips visible to one process — the usual case,
# equivalent to the reference's 8-GPU node) no env vars are needed: one
# process drives every chip through the mesh.
set -euo pipefail

MODEL="${1:-mae_vit_base_MsLdCeCd}"; shift || true
LOSS="${1:-mse}"; shift || true

EXTRA=()
if [[ -n "${COORDINATOR:-}" ]]; then
  EXTRA+=(--coordinator_address "$COORDINATOR"
          --num_processes "${NUM_PROCESSES:?}"
          --process_id "${PROCESS_ID:?}")
fi

python -m cross_scale_mae_tpu.cli.pretrain \
  --model "$MODEL" \
  --loss "$LOSS" \
  --epochs 400 \
  --warmup_epochs 40 \
  --batch_size 4096 \
  --input_size 128 \
  --patch_size 16 \
  --mask_ratio 0.75 \
  --blr 5e-5 \
  --weight_decay 0.05 \
  "${EXTRA[@]}" \
  "$@"
