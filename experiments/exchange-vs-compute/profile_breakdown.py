#!/usr/bin/env python3
"""Profiler-based exchange-vs-compute breakdown of the sharded D2Q9 step.

Replaces wall-clock subtraction (which was below the noise floor for small
grids — see results.csv) with per-op time attribution from a jax.profiler
trace, the analogue of the reference's per-category cycle profile
(experiments/gaussian-blur-scaling/exchange-vs-compute.csv). Buckets:

  exchange  — collective ops (ppermute halo exchange, psum reduction)
  sync      — cross-device rendezvous / executor waits (the BSP-sync
              analogue; on the virtual CPU mesh this is thread rendezvous)
  compute   — every other XLA op (fusions, while loop, copies)

Runs on the 8-virtual-device CPU mesh (collectives are memcpys + thread
sync there, so absolute ratios are not ICI ratios — the analytic TPU model
rows in results.csv cover that); the value here is *op-level attribution*:
how much of the schedule is collectives at all, and how it scales with the
per-shard block size.

Usage: python experiments/exchange-vs-compute/profile_breakdown.py [iters]
Writes profile_breakdown.csv.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.profiler

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.parallel import halo, mesh as mesh_lib

HERE = os.path.dirname(os.path.abspath(__file__))

OP = re.compile(r"^[\w-]+\.\d+$")  # XLA op instances: fusion.12, ppermute.27
EXCHANGE = re.compile(r"ppermute|collective|psum|all-reduce|all-gather",
                      re.IGNORECASE)
SYNC_NAMES = ("Rendezvous", "Wait for rendezvous callback")


def classify(name: str) -> str | None:
    if name in SYNC_NAMES or name.startswith("Wait: pending_threads"):
        return "sync"
    if OP.match(name):
        return "exchange" if EXCHANGE.search(name) else "compute"
    return None  # host/python/umbrella events


def breakdown(n: int, iters: int):
    p = Params(nx=n, ny=n, max_iters=iters, reynolds_dim=10, density=0.1,
               accel=0.005, omega=1.85)
    f0 = state.initial_distributions(p, np.float32)
    mask = np.zeros((n, n), bool)
    mesh = mesh_lib.make_mesh(8, n, n)
    f, pm, am, (pr, pc) = halo.prepare_sharded(p, f0, mask, mesh, "ppermute",
                                               first_accelerate=True)

    def run():
        return halo.run_sharded(
            f, pm, am, mesh=mesh, num_steps=iters, omega=p.omega,
            accel_w1=p.density * p.accel / 9, accel_w2=p.density * p.accel / 36,
            exchange="ppermute", pad_rows=pr, pad_cols=pc)

    np.asarray(run()[1])  # compile + warm
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            np.asarray(run()[1])
        trace, = glob.glob(f"{td}/**/*.trace.json.gz", recursive=True)
        events = json.load(gzip.open(trace))["traceEvents"]
    tot = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            cat = classify(e.get("name", ""))
            if cat:
                tot[cat] += e["dur"]
    return tot, mesh.devices.shape


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_path = os.path.join(HERE, "profile_breakdown.csv")
    with open(out_path, "w") as out:
        out.write("grid,mesh,platform,iters,exchange_ms,sync_ms,compute_ms,"
                  "exchange_pct_of_ops,sync_pct\n")
        for n in (256, 512, 1024, 2048):
            # record the iter count actually RUN (2048^2 is reduced), so
            # absolute ms columns stay comparable per-iteration
            n_it = iters if n < 2048 else max(iters // 5, 10)
            tot, (r, c) = breakdown(n, n_it)
            ex, sy, co = (tot[k] / 1e3 for k in ("exchange", "sync", "compute"))
            total = ex + sy + co
            row = (f"{n}x{n},{r}x{c},cpu,{n_it},{ex:.1f},{sy:.1f},{co:.1f},"
                   f"{100 * ex / total:.1f},{100 * sy / total:.1f}")
            print(row, flush=True)
            out.write(row + "\n")
            out.flush()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
