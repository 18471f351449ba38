#!/usr/bin/env python3
"""Mint full-length f64 oracle av_vels traces for the D3Q19 drift study.

The 2-D side has full-golden-length f32 accuracy evidence on real TPU for
every shipped grid (experiments/golden-matrix); the 3-D side's anchor
stopped at a 200-step trace. This mints >=6000-step f64 traces with the
native serial oracle (native/d3q19_serial.cpp, the compareLbm analogue —
reference methodology: /root/reference/check/check.py:106-129) at one
shape per production kernel route:

  * 16x64x128  -> slab    (d3q19_pallas_inplace, K=3 bz=4)
  * 8x256x256  -> blocked (d3q19_pallas_inplace_blocked, 256^2 planes
                           exceed the slab VMEM estimate)

Cross-check: the native f64 av_vels must match the JAX f64 engine to
rtol 1e-12 over a 200-step prefix (the same class of agreement as the
committed 16x16x32 anchor), recorded in mint.csv. CPU-only — no TPU
contact, no persistent compile cache (so it cannot race a concurrent
TPU process on .jax_cache/).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))

SHAPES = [  # (nz, ny, nx, steps, expected kernel route)
    (16, 64, 128, 6000, "slab"),
    (8, 256, 256, 6000, "blocked"),
]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from lbm_tpu.core import io
    from lbm_tpu.ops import d3q19, d3q19_native, d3q19_pallas_inplace_blocked

    if not d3q19_native.available():
        print("native 3-D oracle not built — run `make -C native` first")
        return False

    rows = ["shape,steps,route,prefix_rel_err_vs_jax_f64,trace_file"]
    for nz, ny, nx, steps, route in SHAPES:
        kind, bz, by, k = d3q19_pallas_inplace_blocked.choose_k(
            nz, ny, nx, steps)
        assert kind == route, (
            f"{nz}x{ny}x{nx} routes to {kind!r}, expected {route!r} — "
            "pick a different shape so both kernels carry drift evidence")

        _, av = d3q19_native.simulate(nz, ny, nx, num_steps=steps,
                                      dtype=np.float64)
        with jax.enable_x64(True):
            _, av_j = d3q19.simulate(nz, ny, nx, num_steps=200,
                                     dtype=np.float64)
        av_j = np.asarray(av_j, np.float64)
        rel = float(np.max(np.abs(av[1:200] - av_j[1:])
                           / np.abs(av_j[1:])))
        assert rel < 1e-11, f"oracle/JAX f64 divergence: {rel:.2e}"

        name = f"d3q19_{nz}x{ny}x{nx}_{steps}.av_vels.dat"
        io.write_av_vels(os.path.join(HERE, name), av)
        rows.append(f"{nz}x{ny}x{nx},{steps},{route},{rel:.3e},{name}")
        print(rows[-1], flush=True)

    with open(os.path.join(HERE, "mint.csv"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote mint.csv")
    return True


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
