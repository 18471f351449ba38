"""Temporal-blocked blur on images too large for VMEM residency.

The resident engine caps at ~1600^2 (VMEM); beyond that the banded Pallas
engine streams the image from HBM once per pass. blur_k_pallas fuses K
passes per HBM sweep (the blur analogue of the LBM K-step kernel), cutting
per-pass HBM traffic to 1/K. This measures single-pass vs K=2/4/8 on a
synthetic 4096x4096 RGBA image (f32: 269 MB/buffer; bf16: 134 MB).

Differential timing (see blur-resident-opt): per-pass = median of 3 of
(t(hi) - t(lo)) / (hi - lo) with >= ~40 HBM sweeps in the delta.

Usage: python experiments/blur-kpass/run.py    (real TPU)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import stencil
from lbm_tpu.utils import profiling

profiling.enable_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"))


@functools.partial(jax.jit, static_argnames=("n_passes", "k", "band"))
def run_passes(x, inter, *, n_passes, k, band=None):
    if k == 1:
        def body(c, _):
            return stencil.blur_step_pallas(c, inter, band=band), None
    else:
        def body(c, _):
            return stencil.blur_k_pallas(c, inter, k_passes=k, band=band), None

    out, _ = jax.lax.scan(body, x, None, length=n_passes // k)
    return out


def main():
    # 4094x4094 true image -> exactly 4096x4096 padded (band up to 256)
    hp, wp, c = 4096, 4096, 4
    rng = np.random.default_rng(0)
    interior_np = np.zeros((hp, wp), np.float32)
    interior_np[1:-1, 1:-1] = 1
    img_np = rng.random((c, hp, wp)).astype(np.float32) * interior_np

    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    platform = jax.devices()[0].platform
    configs = [(1, None), (2, None), (4, None), (8, None),
               (4, 64), (8, 64)]  # band None = heuristic (32 at this width)
    if len(sys.argv) > 1:  # e.g. "4:64 8:128" to probe extra configs
        configs = [(int(a.split(":")[0]),
                    None if ":" not in a else int(a.split(":")[1]))
                   for a in sys.argv[1:]]
    with open(out_path, "a" if len(sys.argv) > 1 else "w") as out:
        if len(sys.argv) <= 1:
            out.write("image,platform,dtype,k_passes,band,us_per_pass,"
                      "gb_per_s_effective\n")
        for dtype_name, dtype in (("float32", jnp.float32),
                                  ("bfloat16", jnp.bfloat16)):
            x = jnp.asarray(img_np, dtype)
            inter = jnp.asarray(interior_np, dtype)
            traffic = 2 * c * hp * wp * x.dtype.itemsize  # r+w per plain pass
            for k, band in configs:
                # delta = 300 HBM sweeps (~0.2 s device time at k=1 f32)
                n_lo, n_hi = 5 * k, 5 * k + 300 * k

                def once(n):
                    t0 = time.perf_counter()
                    o = run_passes(x, inter, n_passes=n, k=k, band=band)
                    s = float(jnp.sum(o[:, :1, :128].astype(jnp.float32)))
                    return time.perf_counter() - t0, s

                try:
                    once(n_lo), once(n_hi)  # compile + warm
                    deltas = []
                    for _ in range(3):
                        a, _ = once(n_lo)
                        b, _ = once(n_hi)
                        deltas.append((b - a) / (n_hi - n_lo))
                    us = float(np.median(deltas)) * 1e6
                except Exception as e:  # noqa: BLE001
                    print(f"{dtype_name} k={k} band={band}: "
                          f"{type(e).__name__}: {e}", flush=True)
                    out.write(f"4096x4096,{platform},{dtype_name},{k},"
                              f"{band or 'auto'},failed,0\n")
                    continue
                gbs = traffic / k / us / 1e3
                row = (f"4096x4096,{platform},{dtype_name},{k},"
                       f"{band or 'auto'},{us:.2f},{gbs:.1f}")
                print(row, flush=True)
                out.write(row + "\n")
                out.flush()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
