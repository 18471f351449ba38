#!/usr/bin/env python3
"""Single-chip MLUPS across grid sizes (BASELINE configs 3 and 4's
single-chip half: 1024^2 flagship, 2048^2, 4096^2, plus 8192^2 —
2.4 GB/buffer, still comfortably HBM-resident).

4096^2 f32 state = 604 MB x2 buffers — comfortably HBM-resident on one v5e;
the multi-chip 4096^2 path is exercised by dryrun_multichip / the sharded
tests (no multi-chip hardware in this environment).

Usage: python experiments/large-grid/run.py [iters]   (real TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import d2q9, d2q9_pallas
from lbm_tpu.utils import profiling

profiling.enable_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..', '.jax_cache'))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    iters -= iters % 8  # the K=8 large-grid configs need a multiple of 8
    if iters <= 0:
        sys.exit("iters must be >= 8 (K=8 chunking)")
    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    with open(out_path, "w") as out:
        platform = jax.devices()[0].platform
        out.write("grid,platform,engine,iters,seconds,mlups\n")
        for n in (1024, 2048, 4096, 8192):
            # 8192^2 runs 500 iters: the 2000-iter pure-XLA run crashed the
            # TPU worker in round 2 (CLAUDE.md) and 500 is converged there
            n_it = min(iters, 500) if n >= 8192 else iters
            n_it -= n_it % 8  # K=8 configs need a multiple of 8 (496 @8192)
            f0 = jnp.full((9, n, n), 0.1 / 9, jnp.float32)
            mask_f = jnp.zeros((n, n), jnp.float32)
            mask_b = jnp.zeros((n, n), bool)
            amask = d2q9.accel_row_mask(n, n, n - 2)
            w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
            engines = {
                "jax": lambda ns: d2q9.run(
                    f0, mask_b, amask, num_steps=ns, omega=1.85,
                    accel_w1=w1, accel_w2=w2),
                # the production selector (measured (band, K) optima: K=4 on
                # the resident 1024^2, K=8 at double width beyond — see
                # choose_config + sweepk8.csv)
                "pallas_auto": lambda ns, cfg=d2q9_pallas.choose_config(n, n):
                    d2q9_pallas.run(
                        f0, mask_f, num_steps=ns, omega=1.85, accel_w1=w1,
                        accel_w2=w2, accel_row=n - 2, band=cfg[0],
                        k_steps=cfg[1]),
            }
            for name, fn in engines.items():
                try:
                    np.asarray(fn(n_it)[1])  # compile + warm
                    dt = float("inf")  # best-of-3 (additive tunnel jitter)
                    for _ in range(3):
                        t0 = time.perf_counter()
                        np.asarray(fn(n_it)[1])
                        dt = min(dt, time.perf_counter() - t0)
                except Exception as e:  # noqa: BLE001 - record OOM etc.
                    print(f"{n}x{n},{name}: {type(e).__name__}")
                    out.write(f"{n}x{n},{platform},{name},{n_it},failed,0\n")
                    continue
                mlups = n_it * n * n / dt / 1e6
                row = f"{n}x{n},{platform},{name},{n_it},{dt:.4f},{mlups:.1f}"
                print(row, flush=True)
                out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
