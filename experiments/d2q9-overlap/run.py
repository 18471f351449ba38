#!/usr/bin/env python3
"""Auto-vs-manual pipeline comparison at the production (band, K) configs.

Companion to probe.py (which isolates the overlap question with synthetic
kernels): this times the real production engines —
`d2q9_pallas.run` (automatic pipeline) vs `d2q9_pallas_manual.run`
(explicit double-buffered DMA) — at the choose_config optima, best-of-N
with tots-only materialisation (fetching the lattice would swamp the
timing, CLAUDE.md).

Run on the real TPU:
  python experiments/d2q9-overlap/run.py              # 1024/2048/4096
  python experiments/d2q9-overlap/run.py --sizes 8192 --iters 496
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[1024, 2048, 4096])
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--engines", nargs="*", default=["auto", "manual"])
    ap.add_argument("--device", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.csv"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lbm_tpu.utils import profiling
    if args.device:
        profiling.select_platform(args.device)
    profiling.enable_compilation_cache(os.path.join(REPO, ".jax_cache"))
    platform = jax.devices()[0].platform

    from lbm_tpu.ops import d2q9_pallas, d2q9_pallas_inplace, d2q9_pallas_manual

    engines = {"auto": d2q9_pallas.run, "manual": d2q9_pallas_manual.run,
               "inplace": d2q9_pallas_inplace.run}
    # per-engine measured config tables (the in-place optimum is shallower)
    configs = {"auto": d2q9_pallas.choose_config,
               "manual": d2q9_pallas.choose_config,
               "inplace": d2q9_pallas_inplace.choose_config}
    kw = dict(omega=1.85, accel_w1=0.1 * 0.005 / 9, accel_w2=0.1 * 0.005 / 36)

    header = "engine,platform,grid,band,k,iters,seconds,mlups,us_per_step"
    exists = os.path.exists(args.out)
    out_fh = open(args.out, "a")
    if not exists:
        out_fh.write(header + "\n")
    for size in args.sizes:
        f = jnp.full((9, size, size), 0.11, jnp.float32)
        # equilibrium-ish uniform state: stable over thousands of steps
        mask_f = jnp.zeros((size, size), jnp.float32).at[0, :].set(1.0)
        for eng in args.engines:
            run = engines[eng]
            band, k = configs[eng](size, size)
            iters = args.iters - args.iters % k
            def go():
                _, tots = run(f, mask_f, num_steps=iters, k_steps=k,
                              accel_row=size - 2, band=band, **kw)
                return np.asarray(tots[-1])  # materialise tots only
            go()  # compile + warm
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                go()
                best = min(best, time.perf_counter() - t0)
            mlups = size * size * iters / best / 1e6
            us = best / iters * 1e6
            row = (eng, platform, f"{size}x{size}", band, k, iters,
                   round(best, 4), round(mlups, 1), round(us, 1))
            print(json.dumps({"engine": eng, "grid": f"{size}x{size}",
                              "band": band, "k": k,
                              "mlups": round(mlups, 1),
                              "us_per_step": round(us, 1)}), flush=True)
            # append immediately: a crash mid-sweep must not lose rows
            out_fh.write(",".join(str(x) for x in row) + "\n")
            out_fh.flush()
    out_fh.close()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
