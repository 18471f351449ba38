#!/bin/bash
# Bundle a performance/debug report for one LBM configuration.
#
# TPU recast of the reference's package-up-report.sh:3, which tarred the
# Poplar artifacts (graph.json, execution.json, vars.capnp, archive.a,
# serialized_graph.capnp). The XLA equivalents bundled here:
#   trace/              jax.profiler trace (open in Perfetto/TensorBoard)
#   step.stablehlo.txt  unoptimised StableHLO of the fused step
#   step.optimized.txt  post-XLA-optimisation HLO (the "serialized graph")
#   partitioning.json   device partitioning dump
#   out/                av_vels.dat + final_state.dat of the profiled run
#
# Usage: [DEVICE=cpu|tpu] [ITERS=20] [PARAMS=...] [OBST=...] \
#        ./package-up-report.sh [report.tar.gz]
set -e
cd "$(dirname "$0")"
OUT=${1:-report.tar.gz}
REF=${LBM_REFERENCE_DIR:-/root/reference}
PARAMS=${PARAMS:-$REF/params/input_128x128.params}
OBST=${OBST:-$REF/params/obstacles_128x128.dat}
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

python -m lbm_tpu.cli.lbm --params "$PARAMS" --obstacles "$OBST" \
  --device "${DEVICE:-cpu}" --num-steps "${ITERS:-20}" \
  --trace-dir "$TMP/trace" --partition-json "$TMP/partitioning.json" \
  --out-dir "$TMP/out"

PARAMS="$PARAMS" TMP="$TMP" DEVICE="${DEVICE:-cpu}" python - <<'EOF'
import os

import jax

jax.config.update("jax_platforms", os.environ["DEVICE"])

import jax.numpy as jnp
import numpy as np

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.ops import d2q9
from lbm_tpu.utils import profiling

p = Params.from_file(os.environ["PARAMS"])
tmp = os.environ["TMP"]
aw = d2q9.AccelWeights.from_params(p)
f0 = jnp.asarray(state.initial_distributions(p, np.float32))
mask = jnp.zeros((p.ny, p.nx), bool)
amask = d2q9.accel_row_mask(p.ny, p.nx, p.ny - 2)

def step(f, mask):
    return d2q9.step(f, mask, amask, omega=p.omega,
                     accel_w1=aw.w1, accel_w2=aw.w2)

profiling.dump_hlo(step, f0, mask, path=f"{tmp}/step.stablehlo.txt")
profiling.dump_hlo(step, f0, mask, path=f"{tmp}/step.optimized.txt",
                   optimized=True)
print("dumped HLO")
EOF

tar -czf "$OUT" -C "$TMP" .
echo "wrote $OUT ($(du -h "$OUT" | cut -f1))"
