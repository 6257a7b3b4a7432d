#!/usr/bin/env bash
# Semantic segmentation (reference scripts/train_ss.sh equivalent):
# UperNet + LeMeViT on Potsdam with the config of record.
set -e
python -m lemevit_tpu.cli.train_seg \
  --config configs/seg/upernet_lemevit_tiny_512x512_80k_potsdam.yaml \
  --data-dir "${DATA_DIR:?set DATA_DIR}" \
  --output outputs/semantic_segmentation "$@"
