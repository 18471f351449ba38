#!/usr/bin/env python3
"""Where exactly does VMEM state residency break, and where does K=8 take
over from K=4?

d2q9-blocked-floor showed 1024^2 (37.7 MB state) rides VMEM residency and
2048^2 (151 MB) cannot; choose_config's RESIDENT_STATE_CELLS threshold
(1024^2 cells) was set from those two endpoints only. This experiment
walks the production kernel through the intermediate square sizes and
times BOTH K=4 and K=8 (band 128 everywhere — it divides every size here
and fits both budgets), locating (a) the residency cliff in the K=4
curve and (b) the crossover where K=8 starts winning.

Usage: python experiments/residency-cliff/run.py [iters]   (real TPU;
each (size, K) pair is a fresh Mosaic compile, ~1-5 min cold each)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import functools

import jax
import jax.numpy as jnp

from lbm_tpu.ops import d2q9_pallas
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))

profiling.enable_compilation_cache(
    os.path.join(HERE, "..", "..", ".jax_cache"))

SIZES = (1024, 1152, 1280, 1408, 1536, 1792, 2048)
W1, W2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    iters -= iters % 8
    platform = jax.devices()[0].platform
    out_path = os.path.join(HERE, "results.csv")
    with open(out_path, "w") as out:
        out.write("grid,state_mb,band,k,platform,iters,seconds,mlups\n")
        for n in SIZES:
            f0 = jnp.full((9, n, n), 0.1 / 9, jnp.float32)
            mask_f = jnp.zeros((n, n), jnp.float32)
            state_mb = 9 * n * n * 4 / 2**20

            @functools.partial(jax.jit, static_argnames=("m", "k"))
            def run(f, m, k, _mask=mask_f, _n=n):
                def body(c, _):
                    return d2q9_pallas.stepk(
                        c, _mask, k_steps=k, omega=1.85, accel_w1=W1,
                        accel_w2=W2, accel_row=_n - 2, band=128)
                return jax.lax.scan(body, f, None, length=m // k)

            for k in (4, 8):
                try:
                    np.asarray(run(f0, iters, k)[1])
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        np.asarray(run(f0, iters, k)[1])
                        best = min(best, time.perf_counter() - t0)
                except Exception as e:  # noqa: BLE001
                    print(f"{n}^2 K{k}: {type(e).__name__}", flush=True)
                    out.write(f"{n}x{n},{state_mb:.0f},128,{k},{platform},"
                              f"{iters},failed,0\n")
                    continue
                mlups = iters * n * n / best / 1e6
                row = (f"{n}x{n},{state_mb:.0f},128,{k},{platform},{iters},"
                       f"{best:.4f},{mlups:.1f}")
                print(row, flush=True)
                out.write(row + "\n")
                out.flush()
            del f0, mask_f
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
