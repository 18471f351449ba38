#!/usr/bin/env python3
"""AoS vs SoA state layout for D2Q9 on TPU — measuring the row we designed out.

The reference ships a streaming vertex on the array-of-structures layout
(PropagateVertexAoS, main/codelets/D2Q9CodeletsOld.cpp:509-535) and its
flagship fused kernel also works on AoS blocks (main/LbmAoS.cpp). Our rebuild
made the opposite call: the state is structure-of-arrays (9, ny, nx) because
the TPU's (8, 128) vector tiling wants grid coordinates in the minor dims.
This experiment turns that design claim into a measurement.

The AoS engine here is a best-effort AoS-NATIVE implementation, not a
strawman: state is (ny, nx, 9) end-to-end, streaming rolls each speed's
slice, and the BGK collision is written speed-vectorised (weights/velocity
vectors broadcast over the minor speed axis) — the idiomatic way to write
AoS lattice code. Arithmetic is the same algebraically-rearranged grouping
as the SoA engine (`(4.5 eu)(2/3 + eu) + c_sq`), so both pass the same
100-step golden gate and any speed difference is pure layout.

Why AoS loses on TPU (the prediction): XLA tiles the two minor dims to
(8, 128) vregs, so a minor dim of 9 pads to 128 lanes — ~14x wasted HBM
footprint and VPU lanes for every elementwise op.

Usage: python experiments/layout-aos-vs-soa/run.py [--quick]
Writes results.csv (platform column).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from lbm_tpu.core import io, state
from lbm_tpu.core.params import Obstacles, Params
from lbm_tpu.ops import d2q9
from lbm_tpu.utils import profiling

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")

# Speed k moves by (dy, dx) = SHIFTS[k]; pull-streaming rolls by the same
# amounts (speed k at cell x came from x - e_k). Same numbering as
# core/state.SPEED_VECTORS (LastChance.cpp:1-50).
SHIFTS = [(0, 0), (0, 1), (1, 0), (0, -1), (-1, 0),
          (1, 1), (1, -1), (-1, -1), (-1, 1)]
E_X = jnp.array([0.0, 1, 0, -1, 0, 1, -1, -1, 1], jnp.float32)
E_Y = jnp.array([0.0, 0, 1, 0, -1, 1, 1, -1, -1], jnp.float32)
W_K = jnp.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4, jnp.float32)
OPPOSITE = jnp.array([0, 3, 4, 1, 2, 7, 8, 5, 6], jnp.int32)
# per-speed accelerated-row force in units of (w1, w2)
ACCEL_UNITS = jnp.array([0.0, 1, 0, -1, 0, 0, 0, 0, 0], jnp.float32), \
              jnp.array([0.0, 0, 0, 0, 0, 1, -1, -1, 1], jnp.float32)


def step_aos(f, obstacle_mask, accel_mask, *, omega, accel_w1, accel_w2):
    """One fused timestep on (ny, nx, 9) AoS state. Returns (f', tot_u)."""
    s = jnp.stack(
        [f[..., k] if SHIFTS[k] == (0, 0)
         else jnp.roll(f[..., k], SHIFTS[k], axis=(0, 1))
         for k in range(9)],
        axis=-1)

    rho = s.sum(-1)
    u_x = (s * E_X).sum(-1) / rho
    u_y = (s * E_Y).sum(-1) / rho
    u_sq = u_x * u_x + u_y * u_y
    c_sq = 1.0 - u_sq * 1.5

    eu = u_x[..., None] * E_X + u_y[..., None] * E_Y        # (ny, nx, 9)
    out = (s * (1.0 - omega)
           + (omega * rho)[..., None] * W_K
           * ((4.5 * eu) * (2.0 / 3.0 + eu) + c_sq[..., None]))

    au1, au2 = ACCEL_UNITS
    out = out + accel_mask[..., None] * (accel_w1 * au1 + accel_w2 * au2)

    f_new = jnp.where(obstacle_mask[..., None], s[..., OPPOSITE], out)
    tot_u = jnp.where(obstacle_mask, 0.0, jnp.sqrt(u_sq)).sum()
    return f_new, tot_u


def run_aos(f, obstacle_mask, accel_mask, *, num_steps, omega,
            accel_w1, accel_w2):
    def body(carry, _):
        return step_aos(carry, obstacle_mask, accel_mask, omega=omega,
                        accel_w1=accel_w1, accel_w2=accel_w2)

    return jax.lax.scan(body, f, None, length=num_steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="128x128, 200 timing steps (CPU smoke)")
    args = ap.parse_args()

    profiling.enable_compilation_cache(
        os.path.join(os.path.dirname(HERE), "..", ".jax_cache"))
    platform = jax.devices()[0].platform
    grid = "128x128" if args.quick else "1024x1024"
    steps = 200 if args.quick else 2000
    p = Params.from_file(f"{REF}/params/input_{grid}.params")
    obs = Obstacles.from_file(f"{REF}/params/obstacles_{grid}.dat", p)
    golden = io.read_av_vels(f"{REF}/check/{grid}.av_vels.dat")
    aw = d2q9.AccelWeights.from_params(p)
    accel_row = p.ny - 2
    mask = jnp.asarray(obs.mask)
    amask = d2q9.accel_row_mask(p.ny, p.nx, accel_row)
    n_free = float((~obs.mask).sum())

    f_soa = d2q9.first_accelerate(
        jnp.asarray(state.initial_distributions(p, np.float32)), mask,
        accel_row=accel_row, accel_w1=aw.w1, accel_w2=aw.w2)
    f_aos = jnp.moveaxis(f_soa, 0, -1)

    soa = jax.jit(lambda n: d2q9.run(
        f_soa, mask, amask, num_steps=n, omega=p.omega,
        accel_w1=aw.w1, accel_w2=aw.w2), static_argnums=0)
    # accel_mask broadcasting differs: AoS wants a full (ny, nx) plane for
    # the [..., None] broadcast against the speed axis
    amask_aos = jnp.broadcast_to(amask, (p.ny, p.nx))
    aos = jax.jit(lambda n: run_aos(
        f_aos, mask, amask_aos, num_steps=n, omega=p.omega,
        accel_w1=aw.w1, accel_w2=aw.w2), static_argnums=0)

    rows = ["layout,platform,grid,steps,seconds,mlups,gate_max_rel_err_100,"
            "temp_hbm_bytes"]
    for name, fn in (("soa_9yx", soa), ("aos_yx9", aos)):
        # measured, not assumed: XLA does NOT lane-pad the size-9 minor dim
        # in HBM (argument_size is 9*ny*nx*4 for both layouts); the AoS cost
        # shows up as temp buffers for the relayouts it must insert per step
        nbytes = jax.jit(lambda: fn(steps)).lower().compile() \
            .memory_analysis().temp_size_in_bytes
        _, tot = fn(100)
        av = np.asarray(tot, np.float64) / n_free
        rel = float((np.abs(av - golden[:100]) / golden[:100]).max())
        np.asarray(fn(steps)[1])           # warm (compile) — untimed
        t0 = time.perf_counter()
        np.asarray(fn(steps)[1])           # materialise tots only
        dt = time.perf_counter() - t0
        mlups = steps * p.nx * p.ny / dt / 1e6
        rows.append(f"{name},{platform},{grid},{steps},{dt:.4f},"
                    f"{mlups:.1f},{rel:.3e},{nbytes}")
        print(rows[-1])

    with open(os.path.join(HERE, "results.csv"), "w") as fp:
        fp.write("\n".join(rows) + "\n")
    print("wrote results.csv")


if __name__ == "__main__":
    main()
