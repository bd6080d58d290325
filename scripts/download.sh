#!/usr/bin/env bash
# Fetch model checkpoints ahead of time (the serving environment has no
# egress). Counterpart of the reference's ModelScope download script; uses
# huggingface-cli with ModelScope fallback.
set -euo pipefail

MODELS_DIR="${1:-../models}"
mkdir -p "$MODELS_DIR"

fetch() {
  local repo="$1" dest="$2"
  if [ -d "$MODELS_DIR/$dest" ]; then
    echo "already present: $MODELS_DIR/$dest"
    return
  fi
  if command -v huggingface-cli >/dev/null; then
    huggingface-cli download "$repo" --local-dir "$MODELS_DIR/$dest"
  elif python -c "import modelscope" 2>/dev/null; then
    python -c "from modelscope import snapshot_download; \
      snapshot_download('$repo', local_dir='$MODELS_DIR/$dest')"
  else
    echo "need huggingface-cli or modelscope to fetch $repo" >&2
    exit 1
  fi
}

fetch BAAI/bge-reranker-v2-minicpm-layerwise bge-reranker-v2-minicpm-layerwise
fetch Alibaba-NLP/gte-Qwen2-7B-instruct gte-Qwen2-7B-instruct
