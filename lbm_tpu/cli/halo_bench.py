"""CLI: benchmark halo-exchange strategies over a device mesh.

The analogue of the reference's halo_regions micro-benchmark
(main/HaloRegionApproaches.cpp; CLI `-h strategy -b blockSize -n iters`),
whose headline lesson was that compiler-scheduled "implicit" exchange beats
naive explicit copies by orders of magnitude. Strategies here:

  implicit    — jnp.roll step on a sharded global array (XLA-chosen collectives)
  ppermute    — explicit shard_map 2-wave neighbour exchange
  manytensors — persistent ghost-extended blocks updated by 8 per-direction
                sends (the explicitManyTensors analogue,
                HaloRegionApproaches.cpp:166-357)
  allgather   — boundary rows/cols all-gathered (the deliberately-heavy scheme)
  naive       — every edge and corner its own serialised collective (the
                analogue of the reference's 8,500x-slower explicitOneTensor,
                HaloRegionApproaches.cpp:522-738)

Emits CSV rows: strategy,platform,devices,mesh,grid,iters,seconds,mlups

Usage:
    python -m lbm_tpu.cli.halo_bench --ny 1024 --nx 1024 -n 200 \
        [--strategies implicit,ppermute,manytensors,allgather,naive]
        [--num-devices 8] [--device cpu|tpu]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="halo-exchange strategy bench")
    parser.add_argument("--ny", type=int, default=1024)
    parser.add_argument("--nx", type=int, default=1024)
    parser.add_argument("-n", "--num-iters", type=int, default=200)
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--strategies",
                        default="implicit,ppermute,manytensors,allgather,naive")
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    args = parser.parse_args(argv)

    import jax

    from ..utils.profiling import select_platform

    select_platform(args.device)

    import dataclasses

    import numpy as np

    from ..core import state
    from ..core.params import Params
    from ..parallel import halo, mesh as mesh_lib

    n_dev = args.num_devices or len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev, args.ny, args.nx)
    r, c = mesh.devices.shape

    p = Params(nx=args.nx, ny=args.ny, max_iters=args.num_iters,
               reynolds_dim=10, density=0.1, accel=0.005, omega=1.85)
    f0 = state.initial_distributions(p, np.float32)
    mask = np.zeros((p.ny, p.nx), bool)
    mask[0, :] = True

    platform = jax.devices()[0].platform
    out = sys.stdout
    out.write("strategy,platform,devices,mesh,grid,iters,seconds,mlups\n")
    for strategy in args.strategies.split(","):
        # warm-up / compile
        _, av = halo.simulate_sharded(p, f0, mask, mesh, strategy=strategy)
        np.asarray(av)
        t0 = time.perf_counter()
        _, av = halo.simulate_sharded(p, f0, mask, mesh, strategy=strategy)
        np.asarray(av)  # honest barrier (see bench.py note)
        dt = time.perf_counter() - t0
        mlups = args.num_iters * p.nx * p.ny / dt / 1e6
        out.write(f"{strategy},{platform},{n_dev},{r}x{c},{p.ny}x{p.nx},"
                  f"{args.num_iters},{dt:.4f},{mlups:.1f}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
