#!/usr/bin/env python3
"""Sweep the Pallas kernel's row-band height at 1024x1024.

Reference analogue: experiments/min-partition-size — sweeping min rows/cols
per IPU tile (best 0.3165s at 48-row tiles vs 0.6496s at 72x64). The TPU
question is the same trade: small bands pipeline better but pay more halo-row
DMA overhead; large bands amortise halos but exhaust VMEM.

Usage: python experiments/min-band-size/run.py [iters]   (runs on the default
device — use the real TPU for meaningful numbers)
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.ops import d2q9, d2q9_pallas


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    p = Params(nx=1024, ny=1024, max_iters=iters, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    import jax.numpy as jnp

    f0 = jnp.asarray(state.initial_distributions(p, np.float32))
    mask_f = jnp.zeros((p.ny, p.nx), jnp.float32)
    w1, w2 = d2q9.AccelWeights.from_params(p)

    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    with open(out_path, "w") as out:
        platform = jax.devices()[0].platform
        out.write("band,platform,iters,seconds,mlups\n")
        for band in (8, 16, 32, 64, 128, 256):
            try:
                run = lambda: np.asarray(d2q9_pallas.run(
                    f0, mask_f, num_steps=iters, omega=p.omega,
                    accel_w1=w1, accel_w2=w2, accel_row=p.ny - 2, band=band)[1])
                run()  # compile+warm
                t0 = time.perf_counter()
                run()
                dt = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001 - record OOM etc. as a row
                print(f"band={band}: {type(e).__name__}")
                out.write(f"{band},{platform},{iters},failed,0\n")
                continue
            mlups = iters * p.nx * p.ny / dt / 1e6
            row = f"{band},{platform},{iters},{dt:.4f},{mlups:.1f}"
            print(row)
            out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
