#!/usr/bin/env bash
# reference scripts/test_od.sh equivalent: DOTA submission dump
set -e
python -m lemevit_tpu.cli.train_det \
  --config configs/det/oriented_rcnn_lemevit_small_fpn_1x_dota10.yaml \
  --data-dir "${DATA_DIR:?set DATA_DIR}" --epochs 0 --format-only \
  --initial-checkpoint "${CKPT:?set CKPT}" "$@"
