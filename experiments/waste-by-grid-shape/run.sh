#!/bin/bash
# Partition quality over random grid shapes (reference: waste-by-grid-shape).
set -e
cd "$(dirname "$0")/../.."
python -m lbm_tpu.cli.partition_stats --samples "${SAMPLES:-200}" \
  --devices 1,2,4,8,16 -o "$(dirname "$0")/results.csv"
echo "wrote $(dirname "$0")/results.csv"
