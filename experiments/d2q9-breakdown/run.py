#!/usr/bin/env python3
"""Attribute the flagship 2-D kernel's time: memory movement vs arithmetic.

Companion to experiments/lbm3d-perf/breakdown.py (where the 3-D kernel
turned out to sit at its DMA floor). Here the question is the opposite:
is the 11.4k-MLUPS headline really VPU-bound, i.e. would reducing HBM
traffic further (K>4) or arithmetic help? Modes (d2q9_pallas._kernel):

  full        — production kernel
  stream_only — rolls + shifts, no BGK collision
  copy        — out = in, no compute at all (the DMA floor)

Usage: python experiments/d2q9-breakdown/run.py [iters]
Writes results.csv (platform column).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import d2q9_pallas
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))
N = 1024


@functools.partial(jax.jit, static_argnames=("n", "mode", "k", "band"))
def run_mode(f, mask_f, n, mode, k, band):
    def body(carry, _):
        f2, tots = d2q9_pallas.stepk(
            carry, mask_f, k_steps=k, omega=1.85, accel_w1=0.1 * 0.005 / 9,
            accel_w2=0.1 * 0.005 / 36, accel_row=N - 2, band=band, mode=mode)
        return f2, tots

    return jax.lax.scan(body, f, None, length=n // k)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))
    platform = jax.devices()[0].platform
    f = jnp.full((9, N, N), 0.1 / 9, jnp.float32)
    mask_f = jnp.zeros((N, N), jnp.float32)

    rows = ["mode,platform,grid,band,k,iters,seconds,mlups,us_per_step"]
    for mode in ("full", "stream_only", "copy"):
        for band, k in ((128, 4), (128, 1)):
            n = iters - iters % k
            np.asarray(run_mode(f, mask_f, n, mode, k, band)[1])
            t0 = time.perf_counter()
            np.asarray(run_mode(f, mask_f, n, mode, k, band)[1])
            dt = time.perf_counter() - t0
            rows.append(f"{mode},{platform},{N}x{N},{band},{k},{n},"
                        f"{dt:.4f},{n * N * N / dt / 1e6:.1f},"
                        f"{dt / n * 1e6:.1f}")
            print(rows[-1], flush=True)

    with open(os.path.join(HERE, "results.csv"), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    print("wrote results.csv")


if __name__ == "__main__":
    main()
