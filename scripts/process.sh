#!/usr/bin/env bash
# Unpack the four zedx document packages and run L0 preprocessing
# (counterpart of the reference's unzip + preprocess script; the zedx
# archives ship with mixed gb2312/utf-8 member names, hence -O for director
# and emsplus).
set -euo pipefail

DATA_DIR="${1:-../data}"
cd "$DATA_DIR"
mkdir -p origin_data

unzip -o -O gb2312 director.zedx -d origin_data/director || true
unzip -o -O gb2312 emsplus.zedx -d origin_data/emsplus || true
unzip -o rcp.zedx -d origin_data/rcp || true
unzip -o umac.zedx -d origin_data/umac || true

cd - >/dev/null
python -m easyrag_tpu.corpus.zedx \
  --meta-root "$DATA_DIR/origin_data" \
  --out-root "$DATA_DIR/format_data_with_img"

echo "optional: run OCR + captioning to produce imgmap_filtered.json:"
echo "  python -m easyrag_tpu.corpus.ocr --imgmap $DATA_DIR/format_data_with_img/imgmap_raw.json \\"
echo "      --image-root $DATA_DIR/format_data_with_img \\"
echo "      --out $DATA_DIR/format_data_with_img/imgmap_filtered.json"
