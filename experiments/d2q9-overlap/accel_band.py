#!/usr/bin/env python3
"""Measure the round-4 accel-band specialization (VERDICT #1) on real TPU.

The in-place kernel's per-band accel flags route bands whose K-extended
row range never touches the accelerated row onto a fast path that skips
the body-force ops (bit-identical; on 1024^2/band 128 only 2 of 8 bands
carry the accel row). LBM_D2Q9_ACCEL_SPEC=0 forces every band onto the
with-accel path in the SAME compiled kernel, so spec-on vs spec-off
isolates exactly the fast path's effect — no compile or structural
confound. (The obstacle-free half of the VERDICT idea measured
inapplicable: every shipped reference mask has box walls on all four
sides, so no row band is ever obstacle-free — see the kernel docstring.)

Each variant runs in its own subprocess (the flag is read at trace time).
Usage: python experiments/d2q9-overlap/accel_band.py [--iters N]
Writes accel_band.csv.
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

SIZES = [1024, 2048, 4096]


def _worker(n: int, iters: int) -> int:
    import numpy as np

    import jax.numpy as jnp

    from lbm_tpu.core import state
    from lbm_tpu.core.params import Obstacles, Params
    from lbm_tpu.ops import d2q9, d2q9_pallas_inplace as ip
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(os.path.join(REPO, ".jax_cache"))
    p = Params(nx=n, ny=n, max_iters=iters, reynolds_dim=10,
               density=0.1, accel=0.01 if n == 1024 else 0.005, omega=1.85)
    # the reference 1024^2 mask for the flagship (box walls + line), the
    # box-wall analogue elsewhere — accel-band occupancy is what matters
    if n == 1024:
        ref = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
        mask = Obstacles.from_file(
            f"{ref}/params/obstacles_1024x1024.dat", p).mask
    else:
        mask = np.zeros((n, n), bool)
        mask[0] = True
        mask[-1] = True
        mask[:, 0] = True
        mask[:, -1] = True
    aw = d2q9.AccelWeights.from_params(p)
    f = jnp.asarray(state.initial_distributions(p, np.float32))
    mask_f = jnp.asarray(mask, jnp.float32)
    band, k = ip.choose_config(n, n)

    def runner(m):
        return ip.run(f, mask_f, num_steps=m, omega=p.omega,
                      accel_w1=aw.w1, accel_w2=aw.w2, accel_row=n - 2,
                      k_steps=k, band=band)

    np.asarray(runner(iters)[1])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(runner(iters)[1])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "n": n, "mlups": round(iters * n * n / best / 1e6, 1),
        "band": band, "k": k,
        "spec": os.environ.get("LBM_D2Q9_ACCEL_SPEC", "1")}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()
    rows = ["n,spec,platform,iters,band,k,mlups"]
    for n in SIZES:
        iters = args.iters if n < 8192 else 496
        for spec in ("0", "1"):
            env = dict(os.environ, LBM_D2Q9_ACCEL_SPEC=spec)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(n), str(iters)],
                env=env, capture_output=True, text=True, timeout=2400)
            if proc.returncode:
                print(f"{n}/spec={spec} FAILED: {proc.stderr[-500:]}")
                return 1
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            rows.append(f"{n},{spec},tpu,{iters},{r['band']},{r['k']},"
                        f"{r['mlups']}")
            print(rows[-1], flush=True)
    with open(os.path.join(HERE, "accel_band.csv"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote accel_band.csv")
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        sys.exit(_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2])))
    sys.exit(main())
