#!/usr/bin/env python3
"""Headline benchmark: D2Q9 MLUPS at 1024x1024 on one TPU chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "MLUPS", "vs_baseline": N/2000}

Baseline is the rebuild north-star from BASELINE.json: >=2000 MLUPS/chip at
1024x1024 with av_vels tracking the reference golden data. The benchmark
first gates on correctness (100-step av_vels prefix vs check/ golden within
f32 drift), then times the fastest engine over NUM_STEPS device-resident
steps.
"""

import json
import sys
import time

import numpy as np

NUM_STEPS = 2000
WARMUP_STEPS = NUM_STEPS  # same jit cache entry; see time_engine note
BASELINE_MLUPS = 2000.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from lbm_tpu.core import io, state
    from lbm_tpu.core.params import Obstacles, Params
    from lbm_tpu.ops import d2q9, d2q9_pallas

    ref = "/root/reference"
    p = Params.from_file(f"{ref}/params/input_1024x1024.params")
    obs = Obstacles.from_file(f"{ref}/params/obstacles_1024x1024.dat", p)

    f0 = jnp.asarray(state.initial_distributions(p, np.float32))
    mask = jnp.asarray(obs.mask)
    mask_f = mask.astype(jnp.float32)
    aw = d2q9.AccelWeights.from_params(p)
    accel_row = p.ny - 2
    amask = d2q9.accel_row_mask(p.ny, p.nx, accel_row)
    f_start = d2q9.first_accelerate(f0, mask, accel_row=accel_row,
                                    accel_w1=aw.w1, accel_w2=aw.w2)

    # --- correctness gate: 100-step av_vels prefix vs golden (f64 data) ---
    import dataclasses

    golden = io.read_av_vels(f"{ref}/check/1024x1024.av_vels.dat")
    n_check = 100
    _, tot = d2q9.run(f_start, mask, amask, num_steps=n_check, omega=p.omega,
                      accel_w1=aw.w1, accel_w2=aw.w2)
    av = np.asarray(tot, np.float64) / float((~obs.mask).sum())
    rel = np.abs(av - golden[:n_check]) / golden[:n_check]
    if rel.max() > 1e-3:
        print(json.dumps({
            "metric": "MLUPS/chip @1024x1024 D2Q9 f32",
            "value": 0.0, "unit": "MLUPS", "vs_baseline": 0.0,
            "error": f"correctness gate failed: max rel err {rel.max():.2e}",
        }))
        return 1

    # --- timing: pick the fastest engine ---
    # NB: on the remote-tunnel TPU platform block_until_ready does not flush
    # execution; fetching the per-step sums (np.asarray) is the only honest
    # barrier, so warm up with the same step count (same jit cache entry)
    # and time a second full run.
    def time_engine(runner):
        np.asarray(runner(NUM_STEPS)[1])  # compile + warmup
        t0 = time.perf_counter()
        np.asarray(runner(NUM_STEPS)[1])  # forces the whole scan
        return time.perf_counter() - t0

    engines = {
        "jax": lambda n: d2q9.run(
            f_start, mask, amask, num_steps=n, omega=p.omega,
            accel_w1=aw.w1, accel_w2=aw.w2),
        "pallas": lambda n: d2q9_pallas.run(
            f_start, mask_f, num_steps=n, omega=p.omega,
            accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row, band=256),
    }
    results = {name: time_engine(fn) for name, fn in engines.items()}
    best_name = min(results, key=results.get)
    dt = results[best_name]
    mlups = NUM_STEPS * p.nx * p.ny / dt / 1e6

    print(json.dumps({
        "metric": "MLUPS/chip @1024x1024 D2Q9 f32",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
        "engine": best_name,
        "all_engines_seconds": {k: round(v, 4) for k, v in results.items()},
        "correctness_max_rel_err_100_steps": float(rel.max()),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
