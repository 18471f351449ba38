#!/usr/bin/env python3
"""Generic band x vmem sweep of the K=4 kernel at any grid size
(generalises sweep2048.py; answers round-3's "is the large-grid MLUPS gap
tunable?" for 4096^2+).

Usage: python experiments/large-grid/band_sweep.py --n 4096 [--iters 2000]
       [--bands 32 64 128]          (real TPU)
NB: each new (band, vmem) pair is a fresh Mosaic compile of the K=4 kernel
(~5 min cold); the persistent .jax_cache makes reruns fast.
Writes/appends sweep<N>.csv.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import d2q9_pallas
from lbm_tpu.utils import profiling

profiling.enable_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..', '.jax_cache'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--bands", type=int, nargs="*", default=[32, 64, 128])
    ap.add_argument("--vmem-mb", type=int, default=None,
                    help="flat scoped-VMEM budget override (default: the "
                         "right-sized default_vmem_limit heuristic)")
    args = ap.parse_args()
    iters = args.iters - args.iters % 4
    n = args.n
    f0 = jnp.full((9, n, n), 0.1 / 9, jnp.float32)
    mask_f = jnp.zeros((n, n), jnp.float32)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    vmem = args.vmem_mb * 1024 * 1024 if args.vmem_mb else None

    out_path = os.path.join(os.path.dirname(__file__), f"sweep{n}.csv")
    platform = jax.devices()[0].platform
    append = os.path.exists(out_path)
    with open(out_path, "a" if append else "w") as out:
        if not append:
            out.write("band,vmem_limit,platform,iters,seconds,mlups\n")
        for band in args.bands:
            try:
                run = lambda: np.asarray(d2q9_pallas.run(
                    f0, mask_f, num_steps=iters, omega=1.85, accel_w1=w1,
                    accel_w2=w2, accel_row=n - 2, band=band, k_steps=4,
                    vmem_limit=vmem)[1])
                run()  # compile + warm
                t0 = time.perf_counter()
                run()
                dt = time.perf_counter() - t0
                row = (f"{band},{args.vmem_mb or 'default'},{platform},"
                       f"{iters},{dt:.4f},{iters * n * n / dt / 1e6:.1f}")
            except Exception as e:  # compile failures are data here
                row = (f"{band},{args.vmem_mb or 'default'},{platform},"
                       f"{iters},compile_failed,0")
                print(type(e).__name__, str(e)[:200], file=sys.stderr)
            print(row, flush=True)
            out.write(row + "\n")
            out.flush()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
