#!/usr/bin/env python3
"""Mint self-golden final_state blobs for grids upstream never shipped.

The reference's golden directory documents two missing blobs
(reference: check/.MISSING_LARGE_BLOBS:1-3): 256x256 and 1024x1024
final_state.dat were never committed, so the checker's per-cell gate
(reference: check/check.py:106-129) could only run on 2 of the 4 shipped
grids. This tool mints the missing blobs from this repo's own independent
f64 oracles and records the cross-check evidence:

1. ORACLE OF RECORD — the native serial C++ f64 engine
   (native/d2q9_serial.cpp, no JAX involved) runs the full golden length.
2. TRAJECTORY VALIDATION — its av_vels must match the UPSTREAM golden
   av_vels (which exist for all four grids) at every step within
   --av-gate (default 1e-9 relative; measured ~1e-12 class).
3. INDEPENDENT CROSS-CHECK — the f64 JAX engine (a from-scratch separate
   implementation of the same maths) runs the same config on --device;
   each per-cell final_state field (u_x, u_y, |u|, pressure) must agree
   with the native result within --fs-gate (default 1e-10
   relative-to-field-scale; measured ~1e-13 class).
4. Writes check/<grid>.final_state.dat.gz (gzipped — np.loadtxt and
   verify/check.py read .gz transparently) and appends the evidence row
   to check/MINT.csv.

Usage:
    python verify/mint_golden.py --grid 256x256 [--device tpu]
"""

from __future__ import annotations

import argparse
import gzip
import hashlib
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
CHECK_DIR = os.path.join(REPO, "check")


def field_agreement(a_fields, b_fields) -> dict[str, float]:
    """max|a-b| / max|a| per final_state field (relative-to-scale: the
    velocity fields pass through zero, so plain per-cell relative error
    is ill-defined there; pressure is O(1) and equivalent either way)."""
    out = {}
    for name, a, b in zip(("u_x", "u_y", "u", "pressure"),
                          a_fields, b_fields):
        scale = np.abs(a).max()
        out[name] = float(np.abs(a - b).max() / scale)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", required=True,
                    choices=["128x128", "128x256", "256x256", "1024x1024"])
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"],
                    help="device for the f64 JAX cross-check run")
    ap.add_argument("--av-gate", type=float, default=1e-9)
    ap.add_argument("--fs-gate", type=float, default=1e-10)
    ap.add_argument("--num-steps", type=int, default=None,
                    help="override the full golden length (smoke runs "
                         "write NOTHING)")
    args = ap.parse_args(argv)

    import dataclasses

    from lbm_tpu.core import io
    from lbm_tpu.core.params import Obstacles, Params
    from lbm_tpu.ops import d2q9_native

    p = Params.from_file(f"{REF}/params/input_{args.grid}.params")
    obs = Obstacles.from_file(f"{REF}/params/obstacles_{args.grid}.dat", p)
    if args.num_steps:
        p = dataclasses.replace(p, max_iters=args.num_steps)
    golden_av = io.read_av_vels(f"{REF}/check/{args.grid}.av_vels.dat")
    full_length = p.max_iters == len(golden_av)

    from lbm_tpu.core import state

    f0 = state.initial_distributions(p, np.float64)

    print(f"[1/3] native C++ f64 oracle: {args.grid} x {p.max_iters} steps",
          flush=True)
    t0 = time.perf_counter()
    f_nat, av_nat = d2q9_native.simulate(p, f0, obs.mask)
    t_nat = time.perf_counter() - t0
    n = min(len(av_nat), len(golden_av))
    av_rel = float(np.abs((av_nat[:n] - golden_av[:n])
                          / golden_av[:n]).max())
    print(f"    {t_nat:.0f}s; av_vels vs upstream golden: max rel "
          f"{av_rel:.3e} over {n} steps (gate {args.av_gate:.0e})",
          flush=True)
    if av_rel > args.av_gate:
        print("FAIL: native oracle does not reproduce the upstream golden "
              "trajectory — refusing to mint")
        return 1

    print(f"[2/3] f64 JAX cross-check on device={args.device or 'default'}",
          flush=True)
    import jax

    jax.config.update("jax_enable_x64", True)
    from lbm_tpu.utils.profiling import select_platform

    select_platform(args.device)
    import jax.numpy as jnp

    from lbm_tpu.ops import d2q9

    t0 = time.perf_counter()
    f_jax, av_jax = d2q9.simulate(p, jnp.asarray(f0), jnp.asarray(obs.mask))
    f_jax = np.asarray(f_jax)
    av_jax = np.asarray(av_jax, np.float64)
    t_jax = time.perf_counter() - t0
    av_cross = float(np.abs((av_jax - av_nat) / av_nat).max())
    fields_nat = io.final_state_fields(p, obs.mask, f_nat)
    fields_jax = io.final_state_fields(p, obs.mask, f_jax)
    agree = field_agreement(fields_nat, fields_jax)
    worst = max(agree.values())
    print(f"    {t_jax:.0f}s on {jax.devices()[0].platform}; av_vels "
          f"native-vs-jax max rel {av_cross:.3e}; per-cell field "
          f"agreement {agree} (gate {args.fs_gate:.0e})", flush=True)
    if worst > args.fs_gate:
        print("FAIL: the two independent f64 oracles disagree beyond the "
              "gate — refusing to mint")
        return 1

    if not full_length:
        print("[3/3] smoke run (not full golden length): PASS, writing "
              "nothing")
        return 0

    print("[3/3] writing blob from the native oracle of record", flush=True)
    os.makedirs(CHECK_DIR, exist_ok=True)
    blob = os.path.join(CHECK_DIR, f"{args.grid}.final_state.dat.gz")
    with tempfile.TemporaryDirectory() as tmp:
        raw = os.path.join(tmp, "final_state.dat")
        io.write_final_state(raw, p, obs.mask, f_nat)
        with open(raw, "rb") as src, gzip.open(blob, "wb",
                                               compresslevel=9) as dst:
            shutil.copyfileobj(src, dst)
    digest = hashlib.sha256(open(blob, "rb").read()).hexdigest()[:16]
    mint_csv = os.path.join(CHECK_DIR, "MINT.csv")
    new = not os.path.exists(mint_csv)
    with open(mint_csv, "a") as fh:
        if new:
            fh.write("grid,steps,native_seconds,av_vs_golden_max_rel,"
                     "jax_device,jax_seconds,av_native_vs_jax_max_rel,"
                     "fs_worst_field_rel,sha256_16\n")
        fh.write(f"{args.grid},{p.max_iters},{t_nat:.0f},{av_rel:.3e},"
                 f"{jax.devices()[0].platform},{t_jax:.0f},{av_cross:.3e},"
                 f"{worst:.3e},{digest}\n")
    print(f"wrote {blob} (sha256[:16]={digest}) and MINT.csv row")
    return 0


if __name__ == "__main__":
    sys.exit(main())
