#!/usr/bin/env bash
# reference scripts/benchmark.sh equivalent (bench both, bs 256, 224^2)
set -e
python -m lemevit_tpu.cli.benchmark --bench both --batch-size 256 \
  --img-size 224 "$@"
