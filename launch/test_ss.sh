#!/usr/bin/env bash
# reference scripts/test_ss.sh equivalent: seg eval = --iters 0 eval pass
set -e
python -m lemevit_tpu.cli.train_seg \
  --config configs/seg/upernet_lemevit_tiny_512x512_80k_potsdam.yaml \
  --data-dir "${DATA_DIR:?set DATA_DIR}" --iters 0 \
  --initial-checkpoint "${CKPT:?set CKPT}" "$@"
