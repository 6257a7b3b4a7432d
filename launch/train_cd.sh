#!/usr/bin/env bash
# Change detection (reference scripts/train_cd.sh equivalent): BIT on CDD.
set -e
python -m lemevit_tpu.cli.train_cd \
  --config configs/cd/bit_lemevit_small_cdd.yaml \
  --data-dir "${DATA_DIR:?set DATA_DIR}" \
  --output outputs/change_detection "$@"
