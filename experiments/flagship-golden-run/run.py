#!/usr/bin/env python3
"""Reproducible flagship golden run: 1024x1024, full 20,000 iters, f32, TPU.

Turns the README's headline accuracy claim (max rel err ~5.4e-4 vs
check/1024x1024.av_vels.dat) into a committed, re-runnable artifact. Runs
BOTH production engines (pure-XLA jax and the K=4 Pallas kernel) to full
length, writes av_vels.dat per engine, and asserts the measured f32
state-rounding floor (see experiments/f32-error-decomposition) with margin.

Usage:
    python experiments/flagship-golden-run/run.py [--engine jax|pallas|both]
Writes results.csv (platform column included) + av_vels.<engine>.dat here.
Exit code 0 iff every engine passes the 1.5e-3 assertion.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
FLOOR_WITH_MARGIN = 1.5e-3  # measured ~5.4e-4 at 20k steps; 2.7x margin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="both",
                    choices=["jax", "pallas", "both"])
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    from lbm_tpu.utils.profiling import select_platform

    select_platform(args.device)

    import jax.numpy as jnp

    from lbm_tpu.core import io, state
    from lbm_tpu.core.params import Obstacles, Params
    from lbm_tpu.ops import d2q9, d2q9_pallas
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))

    p = Params.from_file(f"{REF}/params/input_1024x1024.params")
    obs = Obstacles.from_file(f"{REF}/params/obstacles_1024x1024.dat", p)
    golden = io.read_av_vels(f"{REF}/check/1024x1024.av_vels.dat")
    f0 = jnp.asarray(state.initial_distributions(p, np.float32))
    platform = jax.devices()[0].platform

    engines = {}
    if args.engine in ("jax", "both"):
        engines["jax"] = lambda: d2q9.simulate(p, f0, obs.mask)
    if args.engine in ("pallas", "both"):
        engines["pallas_k4"] = lambda: d2q9_pallas.simulate(
            p, f0, obs.mask, k_steps=4, band=128)

    rows = ["engine,platform,grid,steps,max_rel_err,final_rel_err,seconds"]
    ok = True
    for name, fn in engines.items():
        t0 = time.perf_counter()
        _, av = fn()
        av = np.asarray(av, np.float64)
        dt = time.perf_counter() - t0
        rel = np.abs(av - golden) / np.abs(golden)
        passed = rel.max() < FLOOR_WITH_MARGIN
        ok &= passed
        rows.append(f"{name},{platform},1024x1024,{p.max_iters},"
                    f"{rel.max():.3e},{rel[-1]:.3e},{dt:.2f}")
        io.write_av_vels(os.path.join(HERE, f"av_vels.{name}.dat"), av)
        print(f"{name} [{platform}]: {p.max_iters} steps in {dt:.1f}s, "
              f"max rel err {rel.max():.3e} "
              f"({'PASS' if passed else 'FAIL'} < {FLOOR_WITH_MARGIN:.1e})")

    with open(os.path.join(HERE, "results.csv"), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    print("wrote results.csv")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
