#!/usr/bin/env bash
# Oriented detection (reference scripts/train_od.sh equivalent):
# Oriented R-CNN + LeMeViT on DOTA-1.0 with the 1x config of record.
set -e
python -m lemevit_tpu.cli.train_det \
  --config configs/det/oriented_rcnn_lemevit_small_fpn_1x_dota10.yaml \
  --data-dir "${DATA_DIR:?set DATA_DIR}" \
  --output outputs/object_detection "$@"
