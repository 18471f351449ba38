#!/usr/bin/env python3
"""Aspect-ratio robustness sweep for choose_band/choose_config (VERDICT #8).

The selector tables were calibrated on square power-of-two grids
(results.csv, large-grid sweeps). This sweep stresses the selectors at
extreme aspect ratios and a non-power-of-two multiple of 8 — the analogue
of the reference's min-partition-size sweep
(/root/reference/experiments/min-partition-size/results.csv:2-16) — by
timing the production in-place engine at the selector's pick AND at
neighbouring (band, K) alternates. A pick is a MISPICK if an alternate
beats it by > 2% (beyond the measured ±1% rerun variance).

Shapes: 512x8192 (wide), 8192x512 (tall), 1368x1368 (= 8*171*...,
non-power-of-two: feasible bands are only {8, 24, 72} under 128).

Usage: python experiments/d2q9-overlap/aspect.py [--iters N]   (real TPU)
Writes aspect.csv.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

SHAPES = [(512, 8192), (8192, 512), (1368, 1368)]


def feasible_bands(ny: int) -> list[int]:
    return [b for b in range(8, min(ny, 128) + 1, 8)
            if ny % b == 0 and ny // b >= 2]


def configs_for(ny: int, nx: int) -> list[tuple[int, int, str]]:
    """[(band, k, tag)]: the selector pick first, then alternates."""
    from lbm_tpu.ops import d2q9_pallas_inplace as ip

    band, k = ip.choose_config(ny, nx)
    out = [(band, k, "pick")]
    bands = feasible_bands(ny)
    bi = bands.index(band) if band in bands else -1
    if bi > 0:
        out.append((bands[bi - 1], k, "band-"))
    if 0 <= bi < len(bands) - 1:
        out.append((bands[bi + 1], k, "band+"))
    alt_k = 2 if k == 4 else 4
    out.append((band, alt_k, f"k={alt_k}"))
    return out


def _worker(ny: int, nx: int, band: int, k: int, iters: int) -> int:
    import numpy as np

    import jax.numpy as jnp

    from lbm_tpu.core import state
    from lbm_tpu.core.params import Params
    from lbm_tpu.ops import d2q9, d2q9_pallas_inplace as ip
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(os.path.join(REPO, ".jax_cache"))
    p = Params(nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    mask = np.zeros((ny, nx), bool)
    mask[0] = True
    mask[-1] = True
    mask[:, 0] = True
    mask[:, -1] = True
    aw = d2q9.AccelWeights.from_params(p)
    f = jnp.asarray(state.initial_distributions(p, np.float32))
    mask_f = jnp.asarray(mask, jnp.float32)

    def runner(m):
        return ip.run(f, mask_f, num_steps=m, omega=p.omega,
                      accel_w1=aw.w1, accel_w2=aw.w2, accel_row=ny - 2,
                      k_steps=k, band=band)

    np.asarray(runner(iters)[1])

    # Differential timing (the blur methodology): at these cell counts a
    # 496-iter run is ~0.1-0.2 s while the tunnel's fixed materialise
    # latency is ~160 ms, so single-run MLUPS would compress real config
    # differences ~2-3x below the 2% mispick threshold. Dispatch R runs
    # back-to-back and materialise once; t(R_hi) - t(R_lo) cancels the
    # fixed latency exactly and shares one compile.
    def timed(reps: int) -> float:
        t0 = time.perf_counter()
        outs = [runner(iters)[1] for _ in range(reps)]
        np.asarray(outs[-1])
        return time.perf_counter() - t0

    r_lo, r_hi = 2, 10
    best = float("inf")
    for _ in range(3):
        dt = timed(r_hi) - timed(r_lo)
        best = min(best, dt / (r_hi - r_lo))
    print(json.dumps({"mlups": round(iters * ny * nx / best / 1e6, 1)}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=496)
    ap.add_argument("--shapes", default=None,
                    help="comma-separated NYxNX subset (timeboxed runs)")
    args = ap.parse_args()
    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]
    rows = ["ny,nx,band,k,tag,platform,iters,mlups,mispick"]
    bad = 0
    for ny, nx in shapes:
        results = []
        for band, k, tag in configs_for(ny, nx):
            if args.iters % k:
                continue
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(ny), str(nx), str(band), str(k), str(args.iters)],
                capture_output=True, text=True, timeout=2400)
            if proc.returncode:
                # an ALTERNATE config may be genuinely infeasible at the
                # shape (e.g. 512x8192 band=64 K=4 exceeds scoped VMEM) —
                # that is evidence FOR the pick, not a sweep failure
                if tag != "pick":
                    print(f"{ny}x{nx} band={band} k={k} ({tag}): "
                          "infeasible "
                          f"({proc.stderr.strip().splitlines()[-1][:120]})",
                          flush=True)
                    results.append((band, k, tag, float("nan")))
                    continue
                print(f"{ny}x{nx} band={band} k={k} FAILED: "
                      f"{proc.stderr[-400:]}")
                return 1
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            results.append((band, k, tag, r["mlups"]))
            print(f"{ny}x{nx} band={band} k={k} ({tag}): {r['mlups']}",
                  flush=True)
        pick = next(m for b, k, t, m in results if t == "pick")
        best_alt = max((m for b, k, t, m in results
                        if t != "pick" and m == m), default=0.0)
        mis = int(best_alt > pick * 1.02)
        bad += mis
        for band, k, tag, m in results:
            cell = "infeasible" if m != m else m
            rows.append(f"{ny},{nx},{band},{k},{tag},tpu,{args.iters},"
                        f"{cell},{mis if tag == 'pick' else ''}")
        # write incrementally so a timeboxed/killed sweep still leaves
        # committable evidence for the shapes it completed
        with open(os.path.join(HERE, "aspect.csv"), "w") as fh:
            fh.write("\n".join(rows) + "\n")
        print(f"aspect.csv: {len(rows) - 1} rows so far", flush=True)
    print(f"wrote aspect.csv ({bad} mispicks)")
    return 0 if bad == 0 else 2


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        sys.exit(_worker(*(int(x) for x in sys.argv[i + 1 : i + 6])))
    sys.exit(main())
