#!/bin/bash
# Does using every available chip pay off even when the problem fits on one?
# Reference analogue: experiments/should-i-use-all-ipus (answer there: yes,
# 9.4x at 16 IPUs, at the cost of 5.2s -> 84s compile time).
# This is the strong-scaling half of lbm-scaling; kept as its own experiment
# to mirror the reference's study (and we also record compile time).
set -e
cd "$(dirname "$0")/../.."
DEVICE=${DEVICE:-cpu} python experiments/lbm-scaling/run.py "${ITERS:-100}"
{ head -1 experiments/lbm-scaling/results.csv; grep '^strong' experiments/lbm-scaling/results.csv; } | tee "$(dirname "$0")/results.csv"
