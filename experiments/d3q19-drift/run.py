#!/usr/bin/env python3
"""D3Q19 full-length f32 drift vs the minted f64 oracle traces, on TPU.

Closes the 3-D correctness-horizon gap (round-5 VERDICT #4): the 2-D side
has full-golden-length TPU evidence on every grid (golden-matrix); the 3-D
side's anchor stopped at 200 steps, while the 2-D data shows f32 error
grows roughly linearly with step count (2.1e-3 at 80k steps). This runs
both production in-place kernel routes AND the pure-JAX engine full-length
(6000 steps) against the native-f64 traces minted by mint.py
(methodology: /root/reference/check/check.py:106-129).

  * 16x64x128  -> slab kernel route (K=3, bz=4)
  * 8x256x256  -> blocked kernel route (by=64, K=3)

Floors: the measured f32 state-rounding scale at this horizon plus ~2.5x
margin (the 2-D per-step scale at 6k steps is ~2-4e-4; 3-D confirmed the
same class — see results.csv).

Usage: python experiments/d3q19-drift/run.py [--device tpu] [--num-steps N]
Writes results.csv. Exit 0 iff every (shape, engine) passes its floor.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))

FLOOR = 1.5e-3
SHAPES = [  # (nz, ny, nx, steps, expected kernel route)
    (16, 64, 128, 6000, "slab"),
    (8, 256, 256, 6000, "blocked"),
]
ENGINES = ["jax", "pallas-inplace"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--num-steps", type=int, default=None,
                    help="override full length (smoke runs; trace prefix)")
    args = ap.parse_args()

    import jax

    from lbm_tpu.utils.profiling import select_platform

    select_platform(args.device)

    from lbm_tpu.core import io
    from lbm_tpu.ops import d3q19, d3q19_pallas_inplace_blocked
    from lbm_tpu.utils import profiling

    # LBM_TEST_CACHE_DIR: isolate smoke runs from a concurrently-running
    # TPU process — the shared persistent cache has no cross-process write
    # atomicity on this image (see CLAUDE.md)
    profiling.enable_compilation_cache(
        os.environ.get("LBM_TEST_CACHE_DIR")
        or os.path.join(HERE, "..", "..", ".jax_cache"))
    platform = jax.devices()[0].platform

    rows = ["shape,engine,platform,steps,route,max_rel_err,final_rel_err,"
            "floor,check_pass,seconds,mlups"]
    ok = True
    for nz, ny, nx, full_steps, route in SHAPES:
        steps = args.num_steps or full_steps
        golden = io.read_av_vels(os.path.join(
            HERE, f"d3q19_{nz}x{ny}x{nx}_{full_steps}.av_vels.dat"))[:steps]
        kind, bz, by, k = d3q19_pallas_inplace_blocked.choose_k(
            nz, ny, nx, steps)
        assert kind == route or args.num_steps, (
            f"routing regression: {nz}x{ny}x{nx} -> {kind!r}, "
            f"expected {route!r}")
        for engine in ENGINES:
            run_once = lambda: np.asarray(  # materialise = honest barrier
                d3q19.simulate(nz, ny, nx, num_steps=steps,
                               dtype=np.float32, engine=engine)[1],
                np.float64)
            av = run_once()  # compile + warm (cold Mosaic can be minutes)
            t0 = time.perf_counter()
            av = run_once()
            secs = time.perf_counter() - t0
            rel = np.abs(av[1:] - golden[1:len(av)]) / golden[1:len(av)]
            max_rel, final_rel = float(rel.max()), float(rel[-1])
            ok &= max_rel <= FLOOR
            mlups = steps * nz * ny * nx / secs / 1e6
            rows.append(
                f"{nz}x{ny}x{nx},{engine},{platform},{steps},{route},"
                f"{max_rel:.3e},{final_rel:.3e},{FLOOR:.1e},"
                f"{int(max_rel <= FLOOR)},{secs:.2f},{mlups:.0f}")
            print(rows[-1], flush=True)

    if args.num_steps is None:
        with open(os.path.join(HERE, "results.csv"), "w") as fh:
            fh.write("\n".join(rows) + "\n")
        print("wrote results.csv")
    return ok


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
