#!/usr/bin/env python3
"""Strong + weak scaling of the sharded D2Q9 step over device counts.

Reference analogues: experiments/should-i-use-all-ipus (strong: 2200x1122,
1->16 IPUs, 0.284s -> 0.030s) and gaussian-blur-scaling/weak-scaling.sh.

Usage: DEVICE=cpu python experiments/lbm-scaling/run.py [iters]
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


def run_case(ny, nx, n_dev, iters, strategy="ppermute"):
    p = Params(nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    f0 = state.initial_distributions(p, np.float32)
    mask = np.zeros((ny, nx), bool)
    mask[0, :] = True
    mesh = mesh_lib.make_mesh(n_dev, ny, nx)
    _, av = halo.simulate_sharded(p, f0, mask, mesh, strategy=strategy)
    np.asarray(av)
    t0 = time.perf_counter()
    _, av = halo.simulate_sharded(p, f0, mask, mesh, strategy=strategy)
    np.asarray(av)
    dt = time.perf_counter() - t0
    return dt, iters * ny * nx / dt / 1e6


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    max_dev = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= max_dev]

    platform = jax.devices()[0].platform
    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    with open(out_path, "w") as out:
        out.write("mode,platform,devices,grid,iters,seconds,mlups,speedup_vs_1\n")

        # strong scaling: fixed 1024x1024
        base = None
        for n in counts:
            dt, mlups = run_case(1024, 1024, n, iters)
            base = base or dt
            row = (f"strong,{platform},{n},1024x1024,{iters},{dt:.4f},"
                   f"{mlups:.1f},{base / dt:.2f}")
            print(row)
            out.write(row + "\n")

        # weak scaling: 512x512 per device
        base = None
        for n in counts:
            r, c = mesh_lib.best_factorisation(n, 512 * n, 512 * n)
            ny, nx = 512 * r, 512 * c
            dt, mlups = run_case(ny, nx, n, iters)
            base = base or dt
            row = (f"weak,{platform},{n},{ny}x{nx},{iters},{dt:.4f},"
                   f"{mlups:.1f},{base / dt:.2f}")
            print(row)
            out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
