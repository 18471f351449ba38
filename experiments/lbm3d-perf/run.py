#!/usr/bin/env python3
"""D3Q19 engine shoot-out at the stretch config 64x128x256 (BASELINE.json
config 5): pure-XLA vs the fused Pallas z-slab kernel over (bz, K).

Round-1 status (VERDICT weakness 5): XLA 3-D did 559 MLUPS on TPU and the
Pallas kernel had no TPU number at all. This experiment records both and
directs the kernel work. Writes results.csv (platform column included).

Usage: python experiments/lbm3d-perf/run.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import d3q19, d3q19_pallas
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))
NZ, NY, NX = 64, 128, 256
CELLS = NZ * NY * NX


def setup(dtype=np.float32):
    f = jnp.asarray(d3q19.initial_distributions(NZ, NY, NX, 0.1, dtype))
    mask = np.zeros((NZ, NY, NX), bool)
    mask[0] = True
    mask[-1] = True
    return f, jnp.asarray(mask)


def time_engine(fn, iters):
    np.asarray(fn(iters)[1])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(iters)[1])  # materialise = honest barrier (CLAUDE.md)
    return time.perf_counter() - t0


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))
    platform = jax.devices()[0].platform
    f, mask = setup()
    amask = d3q19.accel_plane_mask(NZ, NY, NX, NZ - 2, dtype=f.dtype)
    mask_f = mask.astype(f.dtype)

    rows = ["engine,platform,grid,iters,seconds,mlups,note"]

    dt = time_engine(lambda n: d3q19.run(
        f, mask, amask, num_steps=n, omega=1.85, density=0.1, accel=0.005),
        iters)
    rows.append(f"jax,{platform},{NZ}x{NY}x{NX},{iters},{dt:.4f},"
                f"{iters * CELLS / dt / 1e6:.1f},")
    print(rows[-1])

    for bz, k in ((2, 1), (2, 2), (4, 1), (4, 2), (4, 4), (8, 2), (8, 4)):
        try:
            n = iters - iters % k
            dt = time_engine(lambda m: d3q19_pallas.run(
                f, mask_f, num_steps=m - m % k, k_steps=k, omega=1.85,
                density=0.1, accel=0.005, accel_plane=NZ - 2, bz=bz), n)
            rows.append(f"pallas_bz{bz}_k{k},{platform},{NZ}x{NY}x{NX},{n},"
                        f"{dt:.4f},{n * CELLS / dt / 1e6:.1f},")
        except Exception as e:
            msg = str(e).replace("\n", " ")[:120].replace(",", ";")
            rows.append(f"pallas_bz{bz}_k{k},{platform},{NZ}x{NY}x{NX},,,"
                        f",FAILED: {msg}")
        print(rows[-1])

    with open(os.path.join(HERE, "results.csv"), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    print("wrote results.csv")


if __name__ == "__main__":
    main()
