#!/usr/bin/env bash
# reference scripts/test_cd.sh equivalent: CD eval-only P/R/F1
set -e
python -m lemevit_tpu.cli.train_cd \
  --config configs/cd/bit_lemevit_small_cdd.yaml \
  --data-dir "${DATA_DIR:?set DATA_DIR}" \
  --eval-only "${CKPT:?set CKPT}" "$@"
