#!/usr/bin/env python3
"""Blur engine x dtype sweep over the reference images.

Reference analogue: experiments/gaussian-blur-scaling — the
float / float2 / half4 vectorisation axis (bricks: 2052us float -> 899us
half4 on 1 IPU; total cycles 126.4M float -> 46.2M half4). On TPU the axis is
float32 vs bfloat16 and conv-engine vs fused-Pallas-kernel vs VMEM-resident.

Timing is differential — t(5N) - t(N) over 8N passes — because the axon
tunnel adds ~160 ms dispatch latency that otherwise swamps sub-ms device
times (see experiments/blur-resident-opt). `us_200_passes` is the marginal
device time of the reference's 100x2-pass benchmark unit, directly
comparable to its 899/1397/2052 us bricks rows.

Usage: DEVICE=tpu python experiments/blur-dtype-sweep/run.py [image ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

if os.environ.get("DEVICE") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from lbm_tpu.ops import stencil
from lbm_tpu.utils import image as img_lib
from lbm_tpu.utils import profiling

profiling.enable_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"))

IMAGES = {
    "bricks": "/root/reference/images/bricks.png",
    "leaf": "/root/reference/images/leaf.png",
}

N_LO = 100  # blur_many iterations (2 passes each)


def timed(x, inter, iters, engine, warm=True):
    def once(n):
        np.asarray(stencil.blur_many(x, inter, num_iters=n, engine=engine))

    if warm:
        once(iters)  # compile + warm
    t0 = time.perf_counter()
    once(iters)
    return time.perf_counter() - t0


def per_pass_seconds(x, inter, engine, max_iters=30000):
    """Differential per-pass device time, robust to the tunnel's ~100 ms
    dispatch jitter: grow the high iteration count until the measured
    lo->hi delta clearly exceeds the jitter (>= ~200 ms), then take the
    median of 3 differential samples.  The median itself must reconstruct
    a signal >= 100 ms, else the growth loop continues — a pair of jitter
    spikes once stopped the loop early and produced a *negative* per-pass
    time for an ~11 us kernel."""
    t_lo = timed(x, inter, N_LO, engine)
    n_hi = 5 * N_LO
    while True:
        t_lo = min(t_lo, timed(x, inter, N_LO, engine, warm=False))
        t_hi = timed(x, inter, n_hi, engine)
        t_hi = min(t_hi, timed(x, inter, n_hi, engine, warm=False))
        if t_hi - t_lo >= 0.2 or n_hi >= max_iters:
            deltas = []
            for _ in range(3):
                a = timed(x, inter, N_LO, engine, warm=False)
                b = timed(x, inter, n_hi, engine, warm=False)
                deltas.append((b - a) / (2 * (n_hi - N_LO)))
            med = float(np.median(deltas))
            if med * 2 * (n_hi - N_LO) >= 0.1 or n_hi >= max_iters:
                return med, t_lo
        n_hi = min(max_iters, n_hi * 4)


def main():
    names = [a for a in sys.argv[1:] if a in IMAGES] or list(IMAGES)
    suffix = "-".join(sys.argv[1:]) or ""
    out_path = os.path.join(
        os.path.dirname(__file__), f"results{('-' + suffix) if suffix else ''}.csv")
    with open(out_path, "w") as out:
        platform = jax.devices()[0].platform
        out.write("image,platform,engine,dtype,seconds_e2e_100iters,"
                  "us_per_pass,us_200_passes,mpixels_per_s\n")
        for name in names:
            path = IMAGES[name]
            if not os.path.exists(path):
                continue
            rgba = img_lib.load_png(path)
            fimg = img_lib.to_float_image(rgba)
            padded, interior, (h, w) = img_lib.pad_to_tile(
                fimg.intensities, row_mult=32)  # as models/blur.py
            for engine in ("conv", "pallas", "resident"):
                for dtype_name, dtype in (("float32", jnp.float32),
                                          ("bfloat16", jnp.bfloat16)):
                    x = jnp.asarray(padded, dtype)
                    inter = jnp.asarray(interior, dtype)
                    try:
                        per_pass, t_lo = per_pass_seconds(x, inter, engine)
                    except Exception as e:  # noqa: BLE001 - record failures
                        print(f"{name},{engine},{dtype_name}: "
                              f"{type(e).__name__}: {e}", flush=True)
                        out.write(f"{name},{platform},{engine},{dtype_name},"
                                  f"failed,0,0,0\n")
                        continue
                    mps = h * w / per_pass / 1e6
                    row = (f"{name},{platform},{engine},{dtype_name},"
                           f"{t_lo:.5f},{per_pass * 1e6:.2f},"
                           f"{per_pass * 200e6:.0f},{mps:.1f}")
                    print(row, flush=True)
                    out.write(row + "\n")
                    out.flush()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
