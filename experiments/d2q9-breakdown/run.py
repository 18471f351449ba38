#!/usr/bin/env python3
"""Attribute the 2-D kernel's time: memory movement vs arithmetic.

Companion to experiments/lbm3d-perf/breakdown.py (where the 3-D kernel
turned out to sit at its DMA floor). Here the question is the opposite:
is the 11.4k-MLUPS headline really VPU-bound, i.e. would reducing HBM
traffic further (K>4) or arithmetic help? And at 4096²/8192² — is the
~12% MLUPS drop vs 1024² (experiments/large-grid) a structural DMA/halo
floor or a tunable gap? Modes (d2q9_pallas._kernel):

  full        — production kernel
  stream_only — rolls + shifts, no BGK collision
  copy        — out = in, no compute at all (the DMA floor)

Usage: python experiments/d2q9-breakdown/run.py [--grids 1024 4096 8192]
Writes results.csv (platform column). Iters: 2000 (500 at 8192² — the
long-iteration 8192² runs are what crashed the TPU worker in round 2).
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

from lbm_tpu.ops import d2q9_pallas, d2q9_pallas_manual
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))


@functools.partial(jax.jit,
                   static_argnames=("n", "size", "mode", "k", "band",
                                    "engine"))
def run_mode(f, mask_f, n, size, mode, k, band, engine="auto"):
    eng = d2q9_pallas_manual if engine == "manual" else d2q9_pallas

    def body(carry, _):
        f2, tots = eng.stepk(
            carry, mask_f, k_steps=k, omega=1.85, accel_w1=0.1 * 0.005 / 9,
            accel_w2=0.1 * 0.005 / 36, accel_row=size - 2, band=band,
            mode=mode)
        return f2, tots

    return jax.lax.scan(body, f, None, length=n // k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, nargs="*", default=[1024, 4096, 8192])
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--engine", default="auto", choices=["auto", "manual"])
    args = ap.parse_args()

    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))
    platform = jax.devices()[0].platform

    rows = ["mode,platform,grid,band,k,iters,seconds,mlups,us_per_step"
            if args.engine == "auto" else
            "mode,engine,platform,grid,band,k,iters,seconds,mlups,us_per_step"]
    for size in args.grids:
        iters = min(args.iters, 500) if size >= 8192 else args.iters
        # K sweep only at the flagship size (the K=1-vs-4 story); elsewhere
        # the production selector (round 3: K=8 at the widened band) plus
        # the old K=4 config for the serialized-compute comparison
        if size == 1024:
            configs = ((128, 4), (128, 1))
        else:
            band8, k8 = d2q9_pallas.choose_config(size, size)
            configs = ((band8, k8), (d2q9_pallas.choose_band(size, size), 4))
        f = jnp.full((9, size, size), 0.1 / 9, jnp.float32)
        mask_f = jnp.zeros((size, size), jnp.float32)
        for mode in ("full", "stream_only", "copy"):
            for band, k in configs:
                n = iters - iters % k
                np.asarray(run_mode(f, mask_f, n, size, mode, k, band,
                                    args.engine)[1])
                t0 = time.perf_counter()
                np.asarray(run_mode(f, mask_f, n, size, mode, k, band,
                                    args.engine)[1])
                dt = time.perf_counter() - t0
                tag = (f"{mode}" if args.engine == "auto"
                       else f"{mode},{args.engine}")
                rows.append(f"{tag},{platform},{size}x{size},{band},{k},{n},"
                            f"{dt:.4f},{n * size * size / dt / 1e6:.1f},"
                            f"{dt / n * 1e6:.1f}")
                print(rows[-1], flush=True)
        del f, mask_f

    out_name = ("results.csv" if args.engine == "auto"
                else f"results_{args.engine}.csv")
    with open(os.path.join(HERE, out_name), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    print(f"wrote {out_name}")


if __name__ == "__main__":
    main()
