#!/usr/bin/env python3
"""A/B the D3Q19 BGK expression grouping on real TPU (VERDICT #7).

The blocked in-place kernel's three-mode diagnostic attributed its whole
~24% copy-vs-full gap to the BGK ARITHMETIC (copy 5,820 == stream_only
5,818 vs full 4,432 at 32x256x256/K=3 — see description.md), so a lane-op
reduction in the equilibrium expression has real headroom there. The
'paired' grouping shares, per opposite speed pair: eu (eu_opp = -eu), the
quadratic term (4.5 eu) eu + c_sq, the per-weight-class w*omega*rho
product, and the accel-force product — ~35% fewer equilibrium plane-ops
than the reference per-speed grouping. Algebraically identical; rounding
differs at the ulp level, so the native oracle carries the same grouping
as the committed default (fidelity = oracle parity; the reference has no
3-D golden data).

Each variant runs in its OWN subprocess (LBM_D3Q19_GROUPING env var):
kernels inline collide_fields, so the variant is fixed per process and
each variant gets its own Mosaic cache entry.

Usage: python experiments/lbm3d-perf/regroup.py [iters]   (real TPU)
Writes regroup.csv.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

CASES = [
    # (label, nz, ny, nx, kernel)
    ("slab_64x128x256_k3", 64, 128, 256, "slab"),
    ("blocked_32x256x256_k3", 32, 256, 256, "blocked"),
]


def _worker(case: str, iters: int) -> int:
    """Subprocess body: time one case under the current grouping."""
    import numpy as np

    import jax.numpy as jnp

    from lbm_tpu.ops import (d3q19, d3q19_pallas_inplace,
                             d3q19_pallas_inplace_blocked as blk)
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(
        os.path.join(HERE, "..", "..", ".jax_cache"))
    label, nz, ny, nx, kernel = next(
        (c[0], *c[1:]) for c in CASES if c[0] == case)
    f = jnp.asarray(d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32))
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = True
    mask[-1] = True
    mask_f = jnp.asarray(mask, jnp.float32)
    kw = dict(omega=1.85, density=0.1, accel=0.005, accel_plane=nz - 2)
    if kernel == "slab":
        runner = lambda n: d3q19_pallas_inplace.run(
            f, mask_f, num_steps=n, k_steps=3, bz=4, **kw)
    else:
        _, bz, by, k = blk.choose_k(nz, ny, nx, iters)
        runner = lambda n: blk.run(
            f, mask_f, num_steps=n, k_steps=k, bz=bz, by=by, **kw)

    # engine-parity gate vs the jax step (same grouping in-process)
    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)
    _, tots_ref = d3q19.run(f, jnp.asarray(mask), amask, num_steps=24,
                            omega=1.85, density=0.1, accel=0.005)
    _, tots = runner(24)
    rel = float(jnp.max(jnp.abs(tots[1:] - tots_ref[1:])
                        / jnp.abs(tots_ref[1:])))
    assert rel < 4e-4, f"parity gate failed: {rel:.2e}"

    np.asarray(runner(iters)[1])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(runner(iters)[1])
        best = min(best, time.perf_counter() - t0)
    mlups = iters * nz * ny * nx / best / 1e6
    print(json.dumps({"case": case, "mlups": round(mlups, 1),
                      "parity": rel,
                      "grouping": os.environ.get("LBM_D3Q19_GROUPING",
                                                 "paired")}))
    return 0


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    rows = ["case,grouping,platform,iters,mlups,parity_max_rel_err"]
    for case, *_ in CASES:
        for grouping in ("reference", "paired"):
            env = dict(os.environ, LBM_D3Q19_GROUPING=grouping)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", case, str(iters)],
                env=env, capture_output=True, text=True, timeout=2400)
            if proc.returncode:
                print(f"{case}/{grouping} FAILED: {proc.stderr[-500:]}")
                return 1
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            rows.append(f"{case},{grouping},tpu,{iters},{r['mlups']},"
                        f"{r['parity']:.3e}")
            print(rows[-1], flush=True)
    with open(os.path.join(HERE, "regroup.csv"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote regroup.csv")
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        sys.exit(_worker(sys.argv[i + 1], int(sys.argv[i + 2])))
    sys.exit(main())
