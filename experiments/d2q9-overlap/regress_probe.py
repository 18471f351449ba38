#!/usr/bin/env python3
"""Diagnose the round-4 in-place engine regression seen in the 12:00 bench
probe (1024^2: 11.9k -> 8.3k MLUPS; 4096^2: 15.2k -> 7.8k).

Variants, each in its own subprocess on the real TPU:
  r3      — the pre-round-4 kernel (a verbatim snapshot of
            d2q9_pallas_inplace.py @ dae1289, regenerated from git into
            experiments/d2q9-overlap/_r3_snapshot.py on every run — never
            trusted from disk, and never under lbm_tpu/)
  r4s1    — HISTORICAL ONLY (refused without --allow-historical): the
            specialized kernel, LBM_D2Q9_ACCEL_SPEC=1. The specialization
            was reverted after this probe; no code reads the flag any
            more, so on post-revert trees r4s1/r4s0 would silently
            measure the current kernel under a misleading label.
  r4s0    — HISTORICAL ONLY, same guard as r4s1
  r4fix   — the current (post-revert) kernel

MEASURED (regress_probe.csv): r3 12,075 >> r4s1 8,275 ~= r4s0 8,110 at
1024^2 — the regression was the dual-branch kernel structure itself
(2x unrolled code defeating Mosaic pipelining), not the flag values.
The specialization was reverted; r4fix rows confirm parity with r3.

Usage: python experiments/d2q9-overlap/regress_probe.py [--sizes 1024,4096]
Appends rows to regress_probe.csv.
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


R3_COMMIT = "dae1289"  # last pre-round-4 commit of d2q9_pallas_inplace.py
HISTORICAL_VARIANTS = {"r4s0", "r4s1"}


def _load_r3_snapshot():
    """Regenerate the r3 baseline from git and import it from a file path.

    Always rewritten from `git show` so a stale/hand-edited snapshot can
    never masquerade as the r3 baseline, and kept OUT of the lbm_tpu
    package (probe baselines are not product surface).
    """
    import importlib.util

    path = os.path.join(HERE, "_r3_snapshot.py")
    src = subprocess.run(
        ["git", "-C", REPO, "show",
         f"{R3_COMMIT}:lbm_tpu/ops/d2q9_pallas_inplace.py"],
        capture_output=True, text=True, check=True).stdout
    with open(path, "w") as fh:
        fh.write(src)
    # The snapshot was a package module (relative imports), so give it a
    # package-qualified name; the file itself stays outside lbm_tpu/.
    spec = importlib.util.spec_from_file_location(
        "lbm_tpu.ops._r3_snapshot", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _worker(variant: str, n: int, iters: int) -> int:
    import numpy as np
    import jax.numpy as jnp

    from lbm_tpu.core import state
    from lbm_tpu.core.params import Params
    from lbm_tpu.ops import d2q9
    from lbm_tpu.utils import profiling

    if variant == "r3":
        ip = _load_r3_snapshot()
    else:
        from lbm_tpu.ops import d2q9_pallas_inplace as ip

    profiling.enable_compilation_cache(os.path.join(REPO, ".jax_cache"))
    p = Params(nx=n, ny=n, max_iters=iters, reynolds_dim=10,
               density=0.1, accel=0.01 if n == 1024 else 0.005, omega=1.85)
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
        "variant": variant, "n": n,
        "mlups": round(iters * n * n / best / 1e6, 1),
        "band": band, "k": k}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,4096")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--variants", default="r3,r4fix")
    ap.add_argument("--allow-historical", action="store_true",
                    help="permit the r4s0/r4s1 labels even though the "
                         "specialization they measured was reverted")
    args = ap.parse_args()
    requested = set(args.variants.split(","))
    if requested & HISTORICAL_VARIANTS and not args.allow_historical:
        print("refusing r4s0/r4s1: LBM_D2Q9_ACCEL_SPEC is no longer read "
              "(specialization reverted) — these labels would measure the "
              "current kernel. Pass --allow-historical to override.",
              file=sys.stderr)
        return 1
    out = os.path.join(HERE, "regress_probe.csv")
    rows = []
    if not os.path.exists(out):
        rows.append("variant,n,platform,iters,band,k,mlups")
    for n in (int(s) for s in args.sizes.split(",")):
        for variant in args.variants.split(","):
            env = dict(os.environ)
            if variant == "r4s0":
                env["LBM_D2Q9_ACCEL_SPEC"] = "0"
            elif variant == "r4s1":
                env["LBM_D2Q9_ACCEL_SPEC"] = "1"
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", variant, str(n), str(args.iters)],
                env=env, capture_output=True, text=True, timeout=2400)
            if proc.returncode:
                print(f"{variant}/{n} FAILED: {proc.stderr[-800:]}")
                return 1
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            rows.append(f"{variant},{n},tpu,{args.iters},{r['band']},"
                        f"{r['k']},{r['mlups']}")
            print(rows[-1], flush=True)
    with open(out, "a") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote regress_probe.csv")
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        sys.exit(_worker(sys.argv[i + 1], int(sys.argv[i + 2]),
                         int(sys.argv[i + 3])))
    sys.exit(main())
