#!/bin/bash
# Counterpart of the reference `scripts/train_libero_dp.sh`: pick a config,
# pin host threading, launch training. Usage:
#   bash scripts/train_libero_dp.sh [config] [extra CLI overrides...]
set -e
config=${1:-v2a_tpu/config/libero/lb_tk8_luotest.py}
shift || true
export OMP_NUM_THREADS=1
cd "$(dirname "$0")/.."
python scripts/train.py --config "$config" "$@"
