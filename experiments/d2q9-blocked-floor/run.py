#!/usr/bin/env python3
"""Could a (rows x cols)-blocked D2Q9 kernel beat the narrow-band floor —
and why is 1024^2 so much faster than every larger grid?

Two measurements with one pure-copy Pallas kernel (out = in, the whole
(9, ny, nx) state through VMEM each pass):

1. **Shape sweep** (results.csv, default mode): copy throughput for the
   production band shapes vs candidate (by, bx) blocks at 1024^2-8192^2,
   with a deliberately fat 110 MB scoped-VMEM limit (the no-residency
   regime, see below). This bounds ANY blocked kernel from above: a real
   kernel adds halo traffic and cannot beat its own copy floor.

2. **Residency sweep** (residency.csv, --residency): the same copy at
   1024^2 (block 128x1024) as a function of the kernel's scoped-VMEM
   limit. With a right-sized limit (20-48 MB) XLA promotes the
   scan-carried lattice into VMEM (the failed-compile error at 12 MB
   shows the operand annotated `S(1)` = VMEM space) and the "copy" runs
   at ~1,800 GB/s — VMEM bandwidth, impossible for HBM (~820 peak). At a
   110 MB limit there is no headroom for the 2 x 37.7 MB ping-pong state,
   promotion fails, and the same kernel reads ~310 GB/s.

Findings (TPU v5e):
  * >= 2048^2: EVERY feasible shape — full-width bands 16-256 rows,
    blocked 128x1024 .. 512x2048 — lands at 324-332 GB/s. The large-grid
    copy floor is shape-independent; there is no access-pattern redesign
    to try. (36 MB blocks fail: double-buffered in+out exceeds VMEM.)
  * 1024^2 is fast because the state is VMEM-RESIDENT, not because its
    band shape is better: same shape, same grid, 1,870 vs 311 GB/s purely
    by scoped-limit headroom. No grid >= 2048^2 (151 MB state) can ever
    be promoted, so ~330 GB/s (combined r+w) is the hard memory ceiling
    there.
  * Production-kernel corollary (vmem sweep on the real stepk at 4096^2,
    band 32, K=4): 58 MB default 10,216 MLUPS, 90 MB 10,197 — more
    double-buffer headroom does NOT recover the exposed compute
    (d2q9-breakdown: full 1,639 us/step = copy 1,043 + BGK ~600,
    serialized). The large-grid number is structural for this kernel
    family: above the DMA share, below the hidden-compute ideal.

Usage:
  python experiments/d2q9-blocked-floor/run.py [--grids 4096 8192]
  python experiments/d2q9-blocked-floor/run.py --residency
(real TPU; 8192^2 runs 500 iters — longer 8192^2 runs have crashed the
TPU worker, see CLAUDE.md)
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))

# fat scoped limit = the deliberate no-residency regime for the shape
# sweep: leaves no VMEM headroom for XLA to promote the scan state, so
# every row measures the HBM streaming pattern itself
VMEM_LIMIT = 110 * 1024 * 1024


def _copy_kernel(in_ref, out_ref):
    out_ref[...] = in_ref[...]


@functools.partial(jax.jit, static_argnames=("n", "by", "bx", "vmem"))
def run_copy(f, n, by, bx, vmem):
    """n passes of out=in over the (9, ny, nx) state in (9, by, bx)
    VMEM blocks; 2 * 9 * ny * nx * 4 bytes of HBM traffic per pass."""
    _, ny, nx = f.shape
    spec = pl.BlockSpec((9, by, bx), lambda i, j: (0, i, j))
    call = pl.pallas_call(
        _copy_kernel,
        grid=(ny // by, nx // bx),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
    )
    return jax.lax.scan(lambda c, _: (call(c), None), f, None, length=n)[0]


def measure(f, n, by, bx, vmem=VMEM_LIMIT, repeats=3):
    np.asarray(run_copy(f, n, by, bx, vmem)[0, 0, :8])  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run_copy(f, n, by, bx, vmem)[0, 0, :8])
        best = min(best, time.perf_counter() - t0)
    return best


def shape_sweep(grids, platform):
    out_path = os.path.join(HERE, "results.csv")
    with open(out_path, "w") as out:
        out.write("pattern,platform,grid,by,bx,block_mb,iters,seconds,"
                  "gbps_effective\n")
        for size in grids:
            iters = 500 if size >= 8192 else 2000
            f = jnp.zeros((9, size, size), jnp.float32) + 0.1
            shapes = [(16, size), (32, size), (64, size),
                      (128, 1024), (256, 1024), (512, 1024),
                      (256, 2048), (512, 2048), (1024, 1024)]
            for by, bx in shapes:
                if by >= size or bx > size:
                    continue
                block_mb = 9 * by * bx * 4 / 2**20
                if 2 * block_mb * 2**20 > VMEM_LIMIT:
                    continue
                pattern = "band" if bx == size else "blocked"
                try:
                    dt = measure(f, iters, by, bx)
                except Exception as e:  # noqa: BLE001
                    print(f"{by}x{bx} @{size}: {type(e).__name__}",
                          flush=True)
                    out.write(f"{pattern},{platform},{size}x{size},{by},"
                              f"{bx},{block_mb:.0f},{iters},failed,0\n")
                    continue
                gbps = 2 * 9 * size * size * 4 * iters / dt / 1e9
                row = (f"{pattern},{platform},{size}x{size},{by},{bx},"
                       f"{block_mb:.0f},{iters},{dt:.4f},{gbps:.1f}")
                print(row, flush=True)
                out.write(row + "\n")
                out.flush()
    print(f"wrote {out_path}")


def residency_sweep(platform):
    out_path = os.path.join(HERE, "residency.csv")
    size, iters, by, bx = 1024, 2000, 128, 1024
    f = jnp.zeros((9, size, size), jnp.float32) + 0.1
    with open(out_path, "w") as out:
        out.write("grid,by,bx,vmem_limit_mb,platform,iters,seconds,"
                  "gbps_effective,note\n")
        for vmem_mb in (12, 20, 24, 32, 48, 110):
            try:
                dt = measure(f, iters, by, bx, vmem=vmem_mb * 1024 * 1024)
            except Exception as e:  # noqa: BLE001
                print(f"vmem={vmem_mb}MB: {type(e).__name__}", flush=True)
                out.write(f"{size}x{size},{by},{bx},{vmem_mb},{platform},"
                          f"{iters},failed,0,scoped OOM\n")
                continue
            gbps = 2 * 9 * size * size * 4 * iters / dt / 1e9
            note = ("state VMEM-resident" if gbps > 900
                    else "promotion blocked")
            row = (f"{size}x{size},{by},{bx},{vmem_mb},{platform},{iters},"
                   f"{dt:.4f},{gbps:.0f},{note}")
            print(row, flush=True)
            out.write(row + "\n")
            out.flush()
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, nargs="*",
                    default=[1024, 2048, 4096, 8192])
    ap.add_argument("--residency", action="store_true")
    args = ap.parse_args()

    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))
    platform = jax.devices()[0].platform
    if args.residency:
        residency_sweep(platform)
    else:
        shape_sweep(args.grids, platform)


if __name__ == "__main__":
    main()
