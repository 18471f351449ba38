#!/usr/bin/env python3
"""Measure the in-place (aliased) D3Q19 engine against the two-stream slab
kernel, and attribute its new wall.

d2q9-overlap proved the two-stream in/out HBM pattern caps every explicitly
or automatically pipelined kernel at ~290-330 GB/s, while the SAME traffic
aliased in place (`input_output_aliases`) streams at ~520-610 GB/s. The
3-D slab kernel was proven to sit exactly at its DMA floor (breakdown.csv:
full == copy), so its ceiling should scale almost directly with the stream
rate. `d3q19_pallas_inplace` applies the scheme; this script records

  1. in-place vs automatic engine across the shapes of sizes.py: the
     fixed bz=4/K=2 slab row (fails on 256x256-plane shapes whose slab
     working set exceeds VMEM) and the production family row selected by
     d3q19_pallas_inplace_blocked.choose_k (slab K=3 where feasible, the
     blocked in-place kernel beyond),
  2. diagnostic modes (copy / stream_only / full) of the slab in-place
     kernel at the bench shape, at K=2 AND the production depth K=3, to
     locate the new wall (K=2: at the copy floor; K=3: within ~4%), and
  3. the same three-mode triple for the blocked in-place kernel at
     32x256x256/K=3 — copy == stream_only >> full attributes its ~24%
     gap entirely to the BGK arithmetic (see description.md).

Timing: best-of-3 over a 600-iter window (steady-state; see sizes.py).

Usage: python experiments/lbm3d-perf/inplace.py [iters]   (real TPU)
Writes inplace.csv (platform column).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.ops import (d3q19, d3q19_pallas, d3q19_pallas_inplace,
                         d3q19_pallas_inplace_blocked as blk)
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))

profiling.enable_compilation_cache(os.path.join(HERE, "..", "..",
                                                ".jax_cache"))

SHAPES = [(64, 128, 256), (128, 128, 128), (32, 256, 256), (128, 256, 256)]
BENCH_SHAPE = (64, 128, 256)


def _time_best_of(fn, n, repeats=3):
    np.asarray(fn(n)[1])  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(n)[1])
        best = min(best, time.perf_counter() - t0)
    return best


def _case(nz, ny, nx):
    f = jnp.asarray(d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32))
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = mask[-1] = True
    return f, jnp.asarray(mask).astype(f.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_steps", "mode", "nz", "k"))
def _run_mode(f, mask_f, *, num_steps, mode, nz, k=2):
    def body(carry, _):
        f_new, tots = d3q19_pallas_inplace.stepk(
            carry, mask_f, k_steps=k, omega=1.85, density=0.1, accel=0.005,
            accel_plane=nz - 2, bz=4, mode=mode)
        return f_new, tots

    f_fin, tots = jax.lax.scan(body, f, None, length=num_steps // k)
    return f_fin, tots


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    iters -= iters % 6  # divisible by every K in (1, 2, 3)
    out_path = os.path.join(HERE, "inplace.csv")
    platform = jax.devices()[0].platform
    with open(out_path, "w") as out:
        out.write("engine,platform,grid,iters,seconds,mlups,"
                  "gbps_effective\n")
        for nz, ny, nx in SHAPES:
            cells = nz * ny * nx
            f, mask_f = _case(nz, ny, nx)

            def run_auto(n, f=f, mask_f=mask_f, nz=nz, ny=ny, nx=nx):
                bz, by = d3q19_pallas.choose_config(nz, ny, nx, 2)
                return d3q19_pallas.run(
                    f, mask_f, num_steps=n, k_steps=2, omega=1.85,
                    density=0.1, accel=0.005, accel_plane=nz - 2,
                    bz=bz, by=by)

            def run_inplace(n, f=f, mask_f=mask_f, nz=nz):
                return d3q19_pallas_inplace.run(
                    f, mask_f, num_steps=n, k_steps=2, omega=1.85,
                    density=0.1, accel=0.005, accel_plane=nz - 2, bz=4)

            # the production config: choose_k routes slab (K=3) where its
            # working set fits, the blocked in-place kernel beyond
            kind, cbz, cby, ck = blk.choose_k(nz, ny, nx, iters)
            if kind == "slab":
                family_name = f"pallas_inplace_slab_bz{cbz}_k{ck}"

                def run_family(n, f=f, mask_f=mask_f, nz=nz, cbz=cbz,
                               ck=ck):
                    return d3q19_pallas_inplace.run(
                        f, mask_f, num_steps=n, k_steps=ck, omega=1.85,
                        density=0.1, accel=0.005, accel_plane=nz - 2,
                        bz=cbz)
            else:
                family_name = f"pallas_inplace_blocked_bz{cbz}by{cby}_k{ck}"

                def run_family(n, f=f, mask_f=mask_f, nz=nz, cbz=cbz,
                               cby=cby, ck=ck):
                    return blk.run(
                        f, mask_f, num_steps=n, k_steps=ck, omega=1.85,
                        density=0.1, accel=0.005, accel_plane=nz - 2,
                        bz=cbz, by=cby)

            for name, fn, k in (("pallas_auto", run_auto, 2),
                                ("pallas_inplace_bz4_k2", run_inplace, 2),
                                (family_name, run_family, ck)):
                # one aliased HBM stream: 19 reads + 19 writes per cell
                # per K-pass -> 2*19*4/K bytes of traffic per cell-step
                bytes_per_cell_step = 2 * 19 * 4 / k
                try:
                    dt = _time_best_of(fn, iters)
                except Exception as e:  # noqa: BLE001
                    print(f"{name} {nz}x{ny}x{nx}: {type(e).__name__}",
                          flush=True)
                    out.write(f"{name},{platform},{nz}x{ny}x{nx},{iters},"
                              f"failed,0,0\n")
                    continue
                mlups = iters * cells / dt / 1e6
                gbps = mlups * 1e6 * bytes_per_cell_step / 1e9
                row = (f"{name},{platform},{nz}x{ny}x{nx},{iters},"
                       f"{dt:.4f},{mlups:.1f},{gbps:.0f}")
                print(row, flush=True)
                out.write(row + "\n")
                out.flush()

        # diagnostic modes at the bench shape: where is the new wall?
        # K=2 (the original floor proof) AND K=3 (the production depth —
        # "slab at its copy floor" must hold at the config bench.py runs)
        nz, ny, nx = BENCH_SHAPE
        cells = nz * ny * nx
        f, mask_f = _case(nz, ny, nx)
        for k in (2, 3):
            for mode in ("copy", "stream_only", "full"):
                def fn(n, mode=mode, k=k):
                    return _run_mode(f, mask_f, num_steps=n, mode=mode,
                                     nz=nz, k=k)

                dt = _time_best_of(fn, iters)
                mlups = iters * cells / dt / 1e6
                gbps = mlups * 1e6 * (2 * 19 * 4 / k) / 1e9
                tag = "" if k == 2 else f"_k{k}"
                row = (f"inplace_mode_{mode}{tag},{platform},"
                       f"{nz}x{ny}x{nx},{iters},"
                       f"{dt:.4f},{mlups:.1f},{gbps:.0f}")
                print(row, flush=True)
                out.write(row + "\n")
                out.flush()

        # blocked kernel's diagnostic modes at the first blocked shape:
        # copy (DMAs only) / stream_only (+ sub-slice realignment and
        # x-rolls) / full (+ BGK maths) — attributes the copy-vs-full gap
        nz, ny, nx = 32, 256, 256
        cells = nz * ny * nx
        f, mask_f = _case(nz, ny, nx)
        _, cbz, cby, ck = blk.choose_k(nz, ny, nx, iters)

        @functools.partial(jax.jit,
                           static_argnames=("num_steps", "mode"))
        def _blk_mode(f, mask_f, *, num_steps, mode):
            def body(carry, _):
                f_new, tots = blk.stepk(
                    carry, mask_f, k_steps=ck, omega=1.85, density=0.1,
                    accel=0.005, accel_plane=nz - 2, bz=cbz, by=cby,
                    mode=mode)
                return f_new, tots

            return jax.lax.scan(body, f, None, length=num_steps // ck)

        for mode in ("copy", "stream_only", "full"):
            def fn_mode(n, mode=mode):
                return _blk_mode(f, mask_f, num_steps=n, mode=mode)

            dt = _time_best_of(fn_mode, iters)
            mlups = iters * cells / dt / 1e6
            gbps = mlups * 1e6 * (2 * 19 * 4 / ck) / 1e9
            row = (f"blocked_mode_{mode}_bz{cbz}by{cby}_k{ck},{platform},"
                   f"{nz}x{ny}x{nx},{iters},{dt:.4f},{mlups:.1f},{gbps:.0f}")
            print(row, flush=True)
            out.write(row + "\n")
            out.flush()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
