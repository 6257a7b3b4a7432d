#!/usr/bin/env bash
# reference scripts/get_flops.sh equivalent: XLA cost-analysis GMACs
set -e
python -m lemevit_tpu.cli.benchmark --bench profile "$@"
