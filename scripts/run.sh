#!/usr/bin/env bash
# Batch evaluation entry point (counterpart of the reference run script).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m easyrag_tpu.cli --config configs/easyrag.yaml --split "${1:-test}" "${@:2}"
