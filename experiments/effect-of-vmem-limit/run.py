#!/usr/bin/env python3
"""Does the Pallas VMEM-limit knob change kernel performance?

Reference analogue: experiments/effect-of-mem-on-convolution — sweeping
poplin's availableMemoryProportion 0.1..0.9 had no runtime effect (~606us
throughout). The TPU analogue knob is CompilerParams.vmem_limit_bytes: below
the working set it fails to compile; above it, scheduling freedom could in
principle change the pipeline. Sweep it for the K=4 LBM kernel at 1024^2.

Usage: python experiments/effect-of-vmem-limit/run.py [iters]  (real TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import d2q9_pallas


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    iters -= iters % 4
    n = 1024
    f0 = jnp.full((9, n, n), 0.1 / 9, jnp.float32)
    mask_f = jnp.zeros((n, n), jnp.float32)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36

    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    with open(out_path, "w") as out:
        platform = jax.devices()[0].platform
        out.write("vmem_limit_mb,platform,band,iters,seconds,mlups\n")
        for mb in (16, 48, 100):
            try:
                run = lambda ns, mb=mb: d2q9_pallas.run(
                    f0, mask_f, num_steps=ns, omega=1.85, accel_w1=w1,
                    accel_w2=w2, accel_row=n - 2, band=128, k_steps=4,
                    vmem_limit=mb * 1024 * 1024)
                np.asarray(run(iters)[1])
                t0 = time.perf_counter()
                np.asarray(run(iters)[1])
                dt = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001 - too-small limits fail
                print(f"{mb} MB: {type(e).__name__}")
                out.write(f"{mb},{platform},128,{iters},compile_failed,0\n")
                continue
            mlups = iters * n * n / dt / 1e6
            row = f"{mb},{platform},128,{iters},{dt:.4f},{mlups:.1f}"
            print(row, flush=True)
            out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
