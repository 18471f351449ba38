#!/usr/bin/env python3
"""Why does 2048^2 sit at ~9.1k MLUPS when 1024^2 reaches ~11.4k and 4096^2
~9.8k? Sweep band height (and the VMEM budget heuristic) at 2048^2, K=4.

The production choose_band/large-grid heuristic keeps a ~21MB working set
(band 64 at W=2048). This sweep checks whether the dip is a band artefact or
a real property of the 2048-lane row width.

Usage: python experiments/large-grid/sweep2048.py [iters]   (real TPU)
NB: each new (band, vmem) pair is a fresh Mosaic compile of the K=4 kernel
(~5 min cold); the persistent .jax_cache makes reruns fast.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import d2q9_pallas
from lbm_tpu.utils import profiling

profiling.enable_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..', '.jax_cache'))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    iters -= iters % 4
    n = 2048
    f0 = jnp.full((9, n, n), 0.1 / 9, jnp.float32)
    mask_f = jnp.zeros((n, n), jnp.float32)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    if len(sys.argv) > 2:  # e.g. "sweep2048.py 2000 32 128" — one compile each
        configs = [(int(b), None) for b in sys.argv[2:]]
    else:
        configs = [(b, None) for b in (32, 64, 128)]
        configs.append((64, 100 * 1024 * 1024))  # flat generous budget control

    out_path = os.path.join(os.path.dirname(__file__), "sweep2048.csv")
    platform = jax.devices()[0].platform
    append = os.path.exists(out_path) and len(sys.argv) > 2
    with open(out_path, "a" if append else "w") as out:
        if not append:
            out.write("band,vmem_limit,platform,iters,seconds,mlups\n")
        for band, vmem in configs:
            def run(ns):
                return d2q9_pallas.run(
                    f0, mask_f, num_steps=ns, omega=1.85, accel_w1=w1,
                    accel_w2=w2, accel_row=n - 2, band=band, k_steps=4,
                    vmem_limit=vmem)
            try:
                np.asarray(run(iters)[1])
                t0 = time.perf_counter()
                np.asarray(run(iters)[1])
                dt = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001 - record OOM etc.
                print(f"band={band} vmem={vmem}: {type(e).__name__}: {e}",
                      flush=True)
                out.write(f"{band},{vmem or 'default'},{platform},{iters},failed,0\n")
                continue
            mlups = iters * n * n / dt / 1e6
            row = f"{band},{vmem or 'default'},{platform},{iters},{dt:.4f},{mlups:.1f}"
            print(row, flush=True)
            out.write(row + "\n")
            out.flush()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
