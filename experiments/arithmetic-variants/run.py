#!/usr/bin/env python3
"""Does the BGK arithmetic leave speed on the table? Variant study @1024^2.

The production kernel mirrors the reference's expression grouping
(main/LastChance.cpp:213-262) bit-for-bit, including TWO IEEE divisions per
cell (u_x = m_x/rho, u_y = m_y/rho). The kernel is VPU-bound at K=4 (see
docs/TUNING.md), so per-cell op count is the frontier. Variant measured:

  shared_reciprocal — inv_rho = 1/rho computed once, u = m * inv_rho
                      (one division instead of two; ~1 ulp/step different,
                      same state-rounding error class)

Each variant is timed (2000 steps, K=4 Pallas flagship config) AND pushed
through the bench correctness gate (100-step av_vels prefix vs golden);
adopt only if the gate holds and the speedup is real.

Usage: python experiments/arithmetic-variants/run.py
Writes results.csv (platform column).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.core import io, state
from lbm_tpu.core.params import Obstacles, Params
from lbm_tpu.ops import d2q9, d2q9_pallas
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
STEPS = 2000


def main():
    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))
    platform = jax.devices()[0].platform
    p = Params.from_file(f"{REF}/params/input_1024x1024.params")
    obs = Obstacles.from_file(f"{REF}/params/obstacles_1024x1024.dat", p)
    golden = io.read_av_vels(f"{REF}/check/1024x1024.av_vels.dat")
    aw = d2q9.AccelWeights.from_params(p)
    accel_row = p.ny - 2
    f0 = jnp.asarray(state.initial_distributions(p, np.float32))
    mask = jnp.asarray(obs.mask)
    f_start = d2q9.first_accelerate(f0, mask, accel_row=accel_row,
                                    accel_w1=aw.w1, accel_w2=aw.w2)
    mask_f = mask.astype(f_start.dtype)
    n_free = float((~obs.mask).sum())

    def runner(recip):
        return lambda n: d2q9_pallas.run(
            f_start, mask_f, num_steps=n, omega=p.omega, accel_w1=aw.w1,
            accel_w2=aw.w2, accel_row=accel_row, band=128, k_steps=4,
            shared_reciprocal=recip)

    rows = ["variant,platform,grid,steps,seconds,mlups,gate_max_rel_err_100"]
    for name, recip in (("reference_grouping", False),
                        ("shared_reciprocal", True)):
        fn = runner(recip)
        # correctness gate: 100-step prefix
        _, tot = fn(100)
        av = np.asarray(tot, np.float64) / n_free
        rel = float((np.abs(av - golden[:100]) / golden[:100]).max())
        # timing
        np.asarray(fn(STEPS)[1])
        t0 = time.perf_counter()
        np.asarray(fn(STEPS)[1])
        dt = time.perf_counter() - t0
        mlups = STEPS * p.nx * p.ny / dt / 1e6
        rows.append(f"{name},{platform},1024x1024,{STEPS},{dt:.4f},"
                    f"{mlups:.1f},{rel:.3e}")
        print(rows[-1])

    with open(os.path.join(HERE, "results.csv"), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    print("wrote results.csv")


if __name__ == "__main__":
    main()
