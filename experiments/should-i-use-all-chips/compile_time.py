#!/usr/bin/env python3
"""Compile time vs mesh size: the cost side of "use all the chips?".

The reference measured the *runtime* win of using all 16 IPUs alongside its
cost: graph compile time grew 5.2 s (1 IPU) -> 84 s (16 IPUs)
(reference: experiments/should-i-use-all-ipus/description.md). The runtime
half of the TPU recast lives in results.csv; this script completes the study
by timing jax trace+lower and XLA compile of the full sharded scan program
(run_sharded: shard_map + 2-wave ppermute + psum, 100-step lax.scan) per
mesh size on the 8-virtual-device CPU mesh, plus the single-chip compile on
the real TPU.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python experiments/should-i-use-all-chips/compile_time.py --device cpu
    python experiments/should-i-use-all-chips/compile_time.py --device tpu

Appends/writes compile_time.csv:
    platform,devices,mesh,grid,iters,lower_seconds,compile_seconds,total_seconds
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))
CSV = os.path.join(HERE, "compile_time.csv")
HEADER = ("platform,devices,mesh,grid,iters,lower_seconds,compile_seconds,"
          "total_seconds\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--ny", type=int, default=1024)
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--counts", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax

    from lbm_tpu.utils.profiling import select_platform

    select_platform(args.device)

    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.core import state
    from lbm_tpu.core.params import Params
    from lbm_tpu.ops import d2q9
    from lbm_tpu.parallel import halo, mesh as mesh_lib

    platform = jax.devices()[0].platform
    avail = len(jax.devices())
    counts = args.counts or [n for n in (1, 2, 4, 8) if n <= avail]

    p = Params(nx=args.nx, ny=args.ny, max_iters=args.iters, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    aw = d2q9.AccelWeights.from_params(p)
    f0 = state.initial_distributions(p, np.float32)
    mask0 = np.zeros((p.ny, p.nx), bool)
    mask0[0, :] = True

    rows = []
    for n in counts:
        mesh = mesh_lib.make_mesh(n, p.ny, p.nx)
        r, c = mesh.devices.shape
        f_sh, mask_sh, amask_sh, (pr, pc) = halo.prepare_sharded(
            p, f0, mask0, mesh, "ppermute")
        t0 = time.perf_counter()
        lowered = halo.run_sharded.lower(
            f_sh, mask_sh, amask_sh, mesh=mesh, num_steps=p.max_iters,
            omega=p.omega, accel_w1=aw.w1, accel_w2=aw.w2,
            exchange="ppermute", pad_rows=pr, pad_cols=pc)
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        row = (f"{platform},{n},{r}x{c},{p.ny}x{p.nx},{p.max_iters},"
               f"{t1 - t0:.3f},{t2 - t1:.3f},{t2 - t0:.3f}")
        print(row, flush=True)
        rows.append(row)

    # merge with any existing rows from the other platform
    existing = []
    if os.path.exists(CSV):
        with open(CSV) as fp:
            existing = [ln.strip() for ln in fp.readlines()[1:]
                        if ln.strip() and not ln.startswith(platform + ",")]
    def sort_key(row):
        # (platform, numeric device count) — lexicographic sort would put
        # 'cpu,16' before 'cpu,2'
        parts = row.split(",")
        return (parts[0], int(parts[1]))

    with open(CSV, "w") as fp:
        fp.write(HEADER)
        fp.write("\n".join(sorted(existing + rows, key=sort_key)) + "\n")
    print(f"wrote {CSV}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
