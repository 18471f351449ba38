#!/bin/bash
# Compare halo-exchange strategies (implicit / ppermute / allgather).
# Reference analogue: experiments/halo-exchange-approaches/run.sh
set -e
cd "$(dirname "$0")/../.."
DEVICE=${DEVICE:-cpu}
NY=${NY:-512} NX=${NX:-512} ITERS=${ITERS:-100}
if [ "$DEVICE" = cpu ]; then export XLA_FLAGS="--xla_force_host_platform_device_count=8"; fi
python -m lbm_tpu.cli.halo_bench --ny "$NY" --nx "$NX" -n "$ITERS" \
  --device "$DEVICE" | tee "$(dirname "$0")/results.csv"
