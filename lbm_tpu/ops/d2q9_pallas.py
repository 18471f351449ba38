"""Fused D2Q9 collide-and-stream as a single Pallas TPU kernel.

The TPU analogue of the reference's hot vertex `LbmTimeStepVertex`
(main/codelets/D2Q9Codelets.cpp:94-191): one pass over HBM per timestep that
performs pull-streaming, obstacle rebound, BGK collision, the accelerated-row
force, and the partial |u| reduction — nothing intermediate ever returns to
HBM.

Decomposition (the analogue of the reference's tile mapping,
main/include/StructuredGridUtils.hpp): the (9, H, W) state is processed in
row *bands* of B rows. Band i needs one halo row above and below; those are
fetched as 8-row sublane-aligned blocks of the same input with wraparound
encoded in the BlockSpec index_map (`(i*B//8 - 1) % (H//8)`), so the pipeline
DMAs only B+16 input rows per band instead of 3B — the "implicit halo"
strategy that the reference's experiments found fastest
(experiments/halo-exchange-approaches/results.csv). Column wraparound is a
cheap in-VMEM `pltpu.roll` of full lanes.

The per-band Sum|u| partial accumulates into a (1,1) SMEM output across the
sequential TPU grid — the analogue of the reference's on-device
popops::reduceWithOutput + AppendReducedSum pipeline (main/LbmSimple.cpp:28-97).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import Params
from . import d2q9

DEF_VMEM_BUDGET = 64 * 1024 * 1024  # conservative per-core VMEM budget (bytes)


def choose_band(h: int, w: int, vmem_budget: int = DEF_VMEM_BUDGET) -> int:
    """Largest band height B (multiple of 8, divides H) whose working set
    (cur + out + halos + mask, double-buffered) fits the VMEM budget."""
    best = 8
    for b in range(8, h + 1, 8):
        if h % b:
            continue
        # bytes: (2*9*B*W f32 in/out + 2*9*8*W halos + B*W mask) * 2 (pipeline)
        working = (2 * 9 * b * w + 2 * 9 * 8 * w + b * w) * 4 * 2
        if working <= vmem_budget:
            best = b
    return best


def _kernel(f_ref, prev_ref, next_ref, mask_ref, out_ref, tot_ref, *,
            band: int, omega: float, accel_w1: float, accel_w2: float,
            accel_row: int):
    i = pl.program_id(0)

    cur = f_ref[:]            # (9, B, W)
    above = prev_ref[:, 7, :]  # halo row below the band (row i*B - 1)
    below = next_ref[:, 0, :]  # halo row above the band (row i*B + B)

    # rows -1..B (inclusive) for each plane
    ext = jnp.concatenate([above[:, None, :], cur, below[:, None, :]], axis=1)

    def up(k):    # value pulled from row-1 (south neighbour)
        return ext[k, 0:band, :]

    def down(k):  # value pulled from row+1 (north neighbour)
        return ext[k, 2 : band + 2, :]

    def east(x):  # value pulled from col-1 (periodic)
        return pltpu.roll(x, 1, axis=x.ndim - 1)

    def west(x):  # value pulled from col+1 (periodic); roll requires shift >= 0
        return pltpu.roll(x, x.shape[-1] - 1, axis=x.ndim - 1)

    s = (
        cur[0],
        east(cur[1]),
        up(2),
        west(cur[3]),
        down(4),
        east(up(5)),
        west(up(6)),
        west(down(7)),
        east(down(8)),
    )

    obstacle = mask_ref[:] != 0

    # accelerated-row mask from global row index
    rows = i * band + jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)
    amask = (rows == accel_row).astype(cur.dtype)

    f_new, tot_u = d2q9.collide(
        s, obstacle, amask, omega=omega, accel_w1=accel_w1, accel_w2=accel_w2
    )
    out_ref[:] = f_new

    @pl.when(i == 0)
    def _():
        tot_ref[0, 0] = jnp.zeros((), cur.dtype)

    tot_ref[0, 0] += tot_u


@functools.lru_cache(maxsize=32)
def _build_step(shape, dtype_name, band, omega, accel_w1, accel_w2, accel_row,
                interpret):
    ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if ny % band or band % 8:
        raise ValueError(f"band {band} must divide ny {ny} and be a multiple of 8")
    grid = ny // band
    nblk8 = ny // 8
    bb8 = band // 8

    kernel = functools.partial(
        _kernel, band=band, omega=omega, accel_w1=accel_w1, accel_w2=accel_w2,
        accel_row=accel_row,
    )

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((9, band, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            # 8-row block whose LAST row is global row i*B - 1 (periodic)
            pl.BlockSpec((9, 8, nx), lambda i: (0, (i * bb8 - 1) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            # 8-row block whose FIRST row is global row i*B + B (periodic)
            pl.BlockSpec((9, 8, nx), lambda i: (0, (i * bb8 + bb8) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, band, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=75 * ny * nx,
            bytes_accessed=(2 * 9 + 1) * ny * nx * dtype.itemsize,
            transcendentals=ny * nx,  # sqrt
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return call


def step(
    f: jax.Array,
    mask_f: jax.Array,
    *,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    band: int | None = None,
    interpret: bool | None = None,
):
    """One fused timestep. `mask_f` is the obstacle mask as {0,1} in f.dtype.
    Returns (f_new, tot_u scalar)."""
    _, ny, nx = f.shape
    if band is None:
        band = choose_band(ny, nx)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _build_step(
        (ny, nx), jnp.dtype(f.dtype).name, band, float(omega),
        float(accel_w1), float(accel_w2), int(accel_row), bool(interpret),
    )
    f_new, tot = call(f, f, f, mask_f)
    return f_new, tot[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "omega", "accel_w1", "accel_w2", "accel_row",
                     "band", "interpret"),
)
def run(
    f: jax.Array,
    mask_f: jax.Array,
    *,
    num_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    band: int | None = None,
    interpret: bool | None = None,
):
    """`num_steps` Pallas timesteps under one lax.scan (device-resident loop)."""

    def body(carry, _):
        f_new, tot_u = step(
            carry, mask_f, omega=omega, accel_w1=accel_w1, accel_w2=accel_w2,
            accel_row=accel_row, band=band, interpret=interpret,
        )
        return f_new, tot_u

    return jax.lax.scan(body, f, None, length=num_steps)


def simulate(params: Params, f: jax.Array, obstacle_mask: jax.Array, **kw):
    """Reference-semantics full simulation on the Pallas engine.
    Same contract as d2q9.simulate."""
    aw = d2q9.AccelWeights.from_params(params)
    accel_row = params.ny - 2
    obstacle_mask = jnp.asarray(obstacle_mask)
    f = d2q9.first_accelerate(
        jnp.asarray(f), obstacle_mask, accel_row=accel_row,
        accel_w1=aw.w1, accel_w2=aw.w2,
    )
    mask_f = obstacle_mask.astype(f.dtype)
    f_final, tot_u = run(
        f, mask_f, num_steps=params.max_iters, omega=params.omega,
        accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row, **kw,
    )
    num_free = jnp.asarray((~obstacle_mask).sum(), dtype=f.dtype)
    return f_final, tot_u / num_free
