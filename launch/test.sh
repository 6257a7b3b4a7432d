#!/usr/bin/env bash
# reference scripts/test.sh equivalent: classification validation
set -e
python -m lemevit_tpu.cli.validate \
  --data-dir "${DATA_DIR:?set DATA_DIR}" \
  --checkpoint "${CKPT:?set CKPT}" "$@"
