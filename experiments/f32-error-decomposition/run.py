#!/usr/bin/env python3
"""Decompose the f32 av_vels error into state-rounding vs reduction components.

North-star context (BASELINE.json): av_vels <= 1e-5 rel err vs check/. The
f64 CPU engine meets it (~1e-13); the production f32 engine measured 5.4e-4
over the full 20k-step 1024^2 run. This experiment answers WHERE the f32
error comes from, on the full-length 128x128 golden run (40k steps):

  A: f32 state, f32 Sum|u| reduction   (production semantics)
  B: f32 state, f64 Sum|u| reduction   (isolates the reduction component)
  C: f64 state, f64 reduction          (golden-equivalent sanity)

err(A) vs golden = total; err(B) = state-rounding only; the gap A-B is the
per-step reduction component. If B ~= A, the error is state-bound and no
compensated sum can reach 1e-5 with f32 state.

Also probes the raw one-step reduction error at 1024^2: plain f32 jnp.sum of
a realistic |u| plane vs the f64 ground truth, plus a two-float (Dekker/
Neumaier) compensated f32 sum — the candidate in-kernel fix if the reduction
were the bottleneck.

Usage: python experiments/f32-error-decomposition/run.py
Writes results.csv + error-growth.csv next to this file. CPU-only (needs
f64); f32 arithmetic on CPU matches TPU f32 to within fma-contraction
differences, documented in description.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from lbm_tpu.core import io, state  # noqa: E402
from lbm_tpu.core.params import Obstacles, Params  # noqa: E402
from lbm_tpu.ops import d2q9  # noqa: E402

REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))


def run_engine(p, obstacles, dtype, sum_dtype, num_steps):
    """Reference-semantics run with an explicit reduction dtype."""
    aw = d2q9.AccelWeights.from_params(p)
    accel_row = p.ny - 2
    mask = jnp.asarray(obstacles.mask)
    f = jnp.asarray(state.initial_distributions(p, dtype))
    f = d2q9.first_accelerate(f, mask, accel_row=accel_row,
                              accel_w1=aw.w1, accel_w2=aw.w2)
    amask = d2q9.accel_row_mask(p.ny, p.nx, accel_row, dtype=dtype)

    @jax.jit
    def body(carry, _):
        s = d2q9.stream_pull(carry)
        f_new, u_plane = d2q9.collide_fields(
            s, mask, amask, omega=p.omega, accel_w1=aw.w1, accel_w2=aw.w2)
        return f_new, jnp.sum(u_plane.astype(sum_dtype))

    _, tot = jax.lax.scan(body, f, None, length=num_steps)
    return np.asarray(tot, np.float64) / float((~obstacles.mask).sum())


def read_golden(path):
    return np.asarray(io.read_av_vels(path))


def two_float_sum(x32):
    """Neumaier compensated sum of a f32 array in f32 arithmetic — the
    TPU-implementable candidate (no f64 needed on device)."""
    x32 = x32.ravel()
    # hierarchical: row sums first (as a Pallas kernel would), then
    # compensated combine of the 1-D partials
    s = np.float32(0.0)
    c = np.float32(0.0)
    for v in x32:
        t = np.float32(s + v)
        if abs(s) >= abs(v):
            c = np.float32(c + np.float32(s - t) + v)
        else:
            c = np.float32(c + np.float32(v - t) + s)
        s = t
    return float(s) + float(c)


def main():
    # ---- full-length decomposition on the 128x128 golden run ----
    p = Params.from_file(f"{REF}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{REF}/params/obstacles_128x128.dat", p)
    golden = read_golden(f"{REF}/check/128x128.av_vels.dat")
    n = p.max_iters
    print(f"128x128, {n} steps (full golden length)")

    runs = {}
    for name, dtype, sdt in (
        ("A_f32state_f32sum", jnp.float32, jnp.float32),
        ("B_f32state_f64sum", jnp.float32, jnp.float64),
        ("C_f64state_f64sum", jnp.float64, jnp.float64),
    ):
        t0 = time.perf_counter()
        runs[name] = run_engine(p, obs, dtype, sdt, n)
        print(f"  {name}: {time.perf_counter() - t0:.1f}s")

    rows = ["run,platform,grid,steps,max_rel_err_vs_golden,final_rel_err,"
            "median_rel_err"]
    growth = ["step,A_total,B_state_only,AB_reduction_only"]
    rel = {}
    for name, av in runs.items():
        r = np.abs(av - golden[:n]) / np.abs(golden[:n])
        rel[name] = r
        rows.append(f"{name},cpu,128x128,{n},{r.max():.3e},{r[-1]:.3e},"
                    f"{np.median(r):.3e}")
        print(f"  {name}: max rel err {r.max():.3e}  final {r[-1]:.3e}")
    ab = np.abs(runs["A_f32state_f32sum"] - runs["B_f32state_f64sum"]) / np.abs(golden[:n])
    for s in range(0, n, max(1, n // 200)):
        growth.append(f"{s},{rel['A_f32state_f32sum'][s]:.3e},"
                      f"{rel['B_f32state_f64sum'][s]:.3e},{ab[s]:.3e}")
    print(f"  reduction-only component (A-B): max {ab.max():.3e} "
          f"median {np.median(ab):.3e}")

    # ---- one-step reduction-error probe at 1024^2 ----
    p2 = Params.from_file(f"{REF}/params/input_1024x1024.params")
    obs2 = Obstacles.from_file(f"{REF}/params/obstacles_1024x1024.dat", p2)
    aw = d2q9.AccelWeights.from_params(p2)
    mask2 = jnp.asarray(obs2.mask)
    f = jnp.asarray(state.initial_distributions(p2, jnp.float32))
    f = d2q9.first_accelerate(f, mask2, accel_row=p2.ny - 2,
                              accel_w1=aw.w1, accel_w2=aw.w2)
    amask2 = d2q9.accel_row_mask(p2.ny, p2.nx, p2.ny - 2, dtype=jnp.float32)
    f, _ = d2q9.run(f, mask2, amask2, num_steps=1000, omega=p2.omega,
                    accel_w1=aw.w1, accel_w2=aw.w2)
    s = d2q9.stream_pull(f)
    _, u_plane = d2q9.collide_fields(s, mask2, amask2, omega=p2.omega,
                                     accel_w1=aw.w1, accel_w2=aw.w2)
    u32 = np.asarray(u_plane, np.float32)
    exact = np.sum(u32.astype(np.float64))
    plain = float(jnp.sum(jnp.asarray(u32)))
    rowsum = float(jnp.sum(jnp.sum(jnp.asarray(u32), axis=1)))
    comp = two_float_sum(u32)
    rows.append(f"probe_plain_f32_sum,cpu,1024x1024,1,"
                f"{abs(plain - exact) / exact:.3e},,")
    rows.append(f"probe_rowsum_then_sum,cpu,1024x1024,1,"
                f"{abs(rowsum - exact) / exact:.3e},,")
    rows.append(f"probe_neumaier_f32,cpu,1024x1024,1,"
                f"{abs(comp - exact) / exact:.3e},,")
    print(f"1024^2 one-step Sum|u| rel err: plain {abs(plain-exact)/exact:.3e} "
          f"rowsum {abs(rowsum-exact)/exact:.3e} "
          f"neumaier {abs(comp-exact)/exact:.3e}")

    with open(os.path.join(HERE, "results.csv"), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    with open(os.path.join(HERE, "error-growth.csv"), "w") as fp:
        fp.write("\n".join(growth) + "\n")
    print("wrote results.csv, error-growth.csv")


if __name__ == "__main__":
    main()
