#!/usr/bin/env bash
# Classification training launcher (reference scripts/train.sh torchrun
# equivalent). Single-controller JAX: one process per HOST, all local chips
# used automatically; multi-host pods set JAX_COORDINATOR/JAX_NUM_PROCESSES
# /JAX_PROCESS_ID (or SLURM env) and run this same line per host
# (lemevit_tpu/parallel/distributed.py).
set -e
python -m lemevit_tpu.cli.train \
  --config configs/lemevit.yaml \
  --data-dir "${DATA_DIR:?set DATA_DIR}" \
  --output outputs/classification "$@"
