#!/usr/bin/env python3
"""Attribute the D3Q19 kernel's time: memory movement vs rolls vs BGK math.

Uses the kernel's diagnostic modes (d3q19_pallas._kernel `mode`):
  full            — production kernel
  collide_no_roll — full BGK, z-region picks only (no (y,x) lane/sublane rolls)
  stream_only     — rolls + region picks, no BGK collision

All three move identical HBM traffic, so differences are on-chip cost. This
decides whether deeper temporal blocking / spatial (y,x) blocking (which cut
HBM traffic, not arithmetic) can pay.

Usage: python experiments/lbm3d-perf/breakdown.py [iters]
Writes breakdown.csv (platform column).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from lbm_tpu.ops import d3q19, d3q19_pallas
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))
NZ, NY, NX = 64, 128, 256
CELLS = NZ * NY * NX


@functools.partial(jax.jit, static_argnames=("n", "mode", "k", "bz"))
def run_mode(f, mask_f, n, mode, k, bz):
    def body(carry, _):
        f2, tots = d3q19_pallas.stepk(
            carry, mask_f, k_steps=k, omega=1.85, density=0.1, accel=0.005,
            accel_plane=NZ - 2, bz=bz, mode=mode)
        return f2, tots

    return jax.lax.scan(body, f, None, length=n // k)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))
    platform = jax.devices()[0].platform
    import jax.numpy as jnp

    f = jnp.asarray(d3q19.initial_distributions(NZ, NY, NX, 0.1, np.float32))
    mask = np.zeros((NZ, NY, NX), bool)
    mask[0] = True
    mask[-1] = True
    mask_f = jnp.asarray(mask).astype(f.dtype)

    rows = ["mode,platform,grid,bz,k,iters,seconds,mlups,us_per_step"]
    for mode in ("full", "collide_no_roll", "stream_only", "copy"):
        for bz, k in ((4, 2), (4, 1)):
            n = iters - iters % k
            np.asarray(run_mode(f, mask_f, n, mode, k, bz)[1])
            t0 = time.perf_counter()
            np.asarray(run_mode(f, mask_f, n, mode, k, bz)[1])
            dt = time.perf_counter() - t0
            rows.append(f"{mode},{platform},{NZ}x{NY}x{NX},{bz},{k},{n},"
                        f"{dt:.4f},{n * CELLS / dt / 1e6:.1f},"
                        f"{dt / n * 1e6:.1f}")
            print(rows[-1], flush=True)

    with open(os.path.join(HERE, "breakdown.csv"), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    print("wrote breakdown.csv")


if __name__ == "__main__":
    main()
