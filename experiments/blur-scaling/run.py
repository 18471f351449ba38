#!/usr/bin/env python3
"""Strong + weak scaling of the sharded conv blur over device counts.

Reference analogue: experiments/gaussian-blur-scaling (bricks: 899us on 1 IPU
-> 749us on 16; weak scaling 500x1000/IPU near-flat after 2 IPUs). The conv
engine on a sharded padded image is partitioned by XLA with implicit halo
collectives — the winning strategy from the reference's halo study.

Usage: DEVICE=cpu python experiments/blur-scaling/run.py [iters]
"""

import os
import sys
import time

if os.environ.get("DEVICE", "cpu") == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lbm_tpu.ops import stencil
from lbm_tpu.parallel import mesh as mesh_lib
from lbm_tpu.utils import image as img_lib


def run_case(h, w, n_dev, iters):
    rng = np.random.default_rng(0)
    chans = rng.uniform(0, 1, size=(4, h, w)).astype(np.float32)
    padded, interior, _ = img_lib.pad_to_tile(chans)
    mesh = mesh_lib.make_mesh(n_dev, padded.shape[1], padded.shape[2])
    xs = jax.device_put(jnp.asarray(padded),
                        NamedSharding(mesh, P(None, "ry", "rx")))
    ins = jax.device_put(jnp.asarray(interior),
                         NamedSharding(mesh, P("ry", "rx")))
    np.asarray(stencil.blur_many(xs, ins, num_iters=iters))
    t0 = time.perf_counter()
    np.asarray(stencil.blur_many(xs, ins, num_iters=iters))
    dt = time.perf_counter() - t0
    return dt, 2 * iters * h * w / dt / 1e6


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    max_dev = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16) if n <= max_dev]
    platform = jax.devices()[0].platform
    out_path = os.path.join(os.path.dirname(__file__), "results.csv")
    with open(out_path, "w") as out:
        out.write("mode,platform,devices,image,iters,seconds,mpixels_per_s\n")
        for n in counts:  # strong: fixed 1022x2046
            dt, mps = run_case(1022, 2046, n, iters)
            row = f"strong,{platform},{n},1022x2046,{iters},{dt:.4f},{mps:.1f}"
            print(row)
            out.write(row + "\n")
        for n in counts:  # weak: ~500x1000 per device (reference's choice)
            r, c = mesh_lib.best_factorisation(n, 512 * n, 1024 * n)
            h, w = 510 * r, 1022 * c
            dt, mps = run_case(h, w, n, iters)
            row = f"weak,{platform},{n},{h}x{w},{iters},{dt:.4f},{mps:.1f}"
            print(row)
            out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
