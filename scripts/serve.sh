#!/usr/bin/env bash
# Inference-server launcher (beyond-reference: the reference has no serving
# story). Serves a checkpoint dir or an exported .stablehlo artifact.
# Usage: scripts/serve.sh <ckpt-dir|artifact.stablehlo> [extra args...]
set -euo pipefail

SRC="${1:?usage: serve.sh <ckpt-dir|artifact.stablehlo> [args...]}"; shift

if [[ "$SRC" == *.stablehlo ]]; then
  exec python -m cross_scale_mae_tpu.cli.serve --artifact "$SRC" "$@"
else
  exec python -m cross_scale_mae_tpu.cli.serve --ckpt "$SRC" \
    --batch_size 64 --pool mean "$@"
fi
