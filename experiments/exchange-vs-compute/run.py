#!/usr/bin/env python3
"""Split the sharded step's cost into compute vs halo exchange.

Reference analogue: experiments/gaussian-blur-scaling/exchange-vs-compute.csv
(on 16 IPUs global exchange ~3-4k cycles vs compute 4.4-13k — comparable!).
Method here: time the ppermute strategy against an identical step whose
ghost ring is filled locally with zero communication ('none' exchange —
physically wrong, identical FLOPs/traffic otherwise); the difference is the
exchange cost.

Usage: DEVICE=cpu python experiments/exchange-vs-compute/run.py [iters]
"""

import os
import sys
import time

if os.environ.get("DEVICE", "cpu") == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.parallel import halo, mesh as mesh_lib


def time_strategy(p, f0, mask, mesh, strategy, reps=3):
    """min-of-N timing: single runs on a shared host are noise-dominated."""
    _, av = halo.simulate_sharded(p, f0, mask, mesh, strategy=strategy,
                                  allow_invalid=True)
    np.asarray(av)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _, av = halo.simulate_sharded(p, f0, mask, mesh, strategy=strategy,
                                  allow_invalid=True)
        np.asarray(av)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_dev = len(jax.devices())
    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    with open(out_path, "w") as out:
        out.write("grid,devices,iters,total_s,compute_only_s,exchange_s,exchange_pct\n")
        for ny in (256, 512, 1024):
            p = Params(nx=ny, ny=ny, max_iters=iters, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
            f0 = state.initial_distributions(p, np.float32)
            mask = np.zeros((ny, ny), bool)
            mask[0, :] = True
            mesh = mesh_lib.make_mesh(n_dev, ny, ny)
            total = time_strategy(p, f0, mask, mesh, "ppermute")
            compute = time_strategy(p, f0, mask, mesh, "none")
            exch = total - compute  # signed: negative = below noise floor
            pct = 100 * exch / total
            flag = "" if exch >= 0 else " (below noise floor)"
            row = (f"{ny}x{ny},{n_dev},{iters},{total:.4f},{compute:.4f},"
                   f"{exch:.4f},{pct:.1f}{flag}")
            print(row)
            out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
