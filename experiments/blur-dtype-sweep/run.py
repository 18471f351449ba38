#!/usr/bin/env python3
"""Blur engine x dtype sweep over the reference images.

Reference analogue: experiments/gaussian-blur-scaling — the
float / float2 / half4 vectorisation axis (bricks: 2052us float -> 899us
half4 on 1 IPU; total cycles 126.4M float -> 46.2M half4). On TPU the axis is
float32 vs bfloat16 and conv-engine vs fused-Pallas-kernel.

Usage: DEVICE=tpu python experiments/blur-dtype-sweep/run.py [iters]
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

IMAGES = {
    "bricks": "/root/reference/images/bricks.png",
    "leaf": "/root/reference/images/leaf.png",
}


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    with open(out_path, "w") as out:
        platform = jax.devices()[0].platform
        out.write("image,platform,engine,dtype,iters,seconds,us,mpixels_per_s\n")
        for name, path in IMAGES.items():
            if not os.path.exists(path):
                continue
            rgba = img_lib.load_png(path)
            fimg = img_lib.to_float_image(rgba)
            padded, interior, (h, w) = img_lib.pad_to_tile(fimg.intensities)
            for engine in ("conv", "pallas", "resident"):
                for dtype_name, dtype in (("float32", jnp.float32),
                                          ("bfloat16", jnp.bfloat16)):
                    x = jnp.asarray(padded, dtype)
                    inter = jnp.asarray(interior, dtype)
                    np.asarray(stencil.blur_many(x, inter, num_iters=iters,
                                                 engine=engine))
                    t0 = time.perf_counter()
                    np.asarray(stencil.blur_many(x, inter, num_iters=iters,
                                                 engine=engine))
                    dt = time.perf_counter() - t0
                    mps = 2 * iters * h * w / dt / 1e6
                    row = (f"{name},{platform},{engine},{dtype_name},{iters},"
                           f"{dt:.5f},{dt * 1e6:.0f},{mps:.1f}")
                    print(row)
                    out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
