"""Communication-avoiding multi-chip LBM: ghost-band exchange + local
K-step Pallas kernel.

The production distributed path. Each shard owns a contiguous block of grid
rows (1-D 'ry' mesh, full width — columns wrap locally). Instead of
exchanging one halo row every step, each shard carries an 8-row ghost band on
each side, exchanged once per K steps with a single `lax.ppermute` pair; the
fused K-step Pallas kernel (ops/d2q9_pallas.py) then advances the
ghost-extended block K timesteps entirely in VMEM. Information propagates one
row per step, so own rows stay exact for K <= 8 — the ghost rows absorb the
error and are refreshed at the next exchange. Sum|u| partials exclude ghost
rows (they duplicate neighbour rows) and are `psum`'d.

This combines the reference's two best ideas — the fused LbmTimeStepVertex
and its "implicit, compiler-scheduled, batched exchange beats chatty copies"
lesson (experiments/halo-exchange-approaches) — with classic
communication-avoiding stencil tiling. ICI traffic per K steps: 2 x 8 rows of
9 planes, vs 2 x K rows for per-step halo exchange, in 1/K as many messages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import Params
from ..ops import d2q9, d2q9_pallas
from . import mesh as mesh_lib

ROW = mesh_lib.ROW_AXIS
GHOST = 8  # ghost band height = the kernel's halo-block height


def make_row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]).reshape(n, 1),
                (mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS))


def extended_mask(obstacle_mask: np.ndarray, n_shards: int) -> np.ndarray:
    """Per-shard ghost-extended obstacle masks, stacked to
    (n_shards*(h+16), nx) so P('ry') hands each shard its slab."""
    ny, nx = obstacle_mask.shape
    if ny % n_shards:
        raise ValueError(f"ny {ny} not divisible by {n_shards} shards")
    h = ny // n_shards
    if h < GHOST:
        raise ValueError(f"shard height {h} < ghost band {GHOST}")
    slabs = []
    for s in range(n_shards):
        rows = np.arange(s * h - GHOST, s * h + h + GHOST) % ny
        slabs.append(obstacle_mask[rows])
    return np.concatenate(slabs, axis=0)


def make_chunk_fn(
    mesh: Mesh,
    *,
    k_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    ny: int,
    band: int | None = None,
    interpret: bool | None = None,
):
    """Returns a jittable fn advancing the sharded state K steps:
    (f (9,ny,nx) P(None,'ry',None), mask_ext ((r*(h+16)),nx) P('ry',None))
    -> (f', tot_u (K,) replicated)."""
    if not 1 <= k_steps <= GHOST:
        raise ValueError(f"k_steps must be in 1..{GHOST}")
    n_shards = mesh.devices.shape[0]
    h = ny // n_shards

    def local_chunk(f_loc, mask_ext_f):
        # one exchange: 8-row edge blocks ride the row ring
        top8 = f_loc[:, -GHOST:, :]
        bot8 = f_loc[:, :GHOST, :]
        n = jax.lax.psum(1, ROW)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        ghost_south = jax.lax.ppermute(top8, ROW, fwd)  # shard i-1's top rows
        ghost_north = jax.lax.ppermute(bot8, ROW, bwd)  # shard i+1's bottom rows
        ext = jnp.concatenate([ghost_south, f_loc, ghost_north], axis=1)

        shard_start = jax.lax.axis_index(ROW).astype(jnp.int32) * h
        ext_new, tots = d2q9_pallas.stepk(
            ext, mask_ext_f, k_steps=k_steps, omega=omega,
            accel_w1=accel_w1, accel_w2=accel_w2, accel_row=accel_row,
            band=band, interpret=interpret,
            row_offset=shard_start - GHOST,
            valid_rows=(GHOST, GHOST + h),
            global_ny=ny,
        )
        f_new = ext_new[:, GHOST : GHOST + h, :]
        return f_new, jax.lax.psum(tots, ROW)

    return jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(None, ROW, None), P(ROW, None)),
        out_specs=(P(None, ROW, None), P()),
        # pallas_call's out_shape carries no varying-mesh-axis info
        check_vma=False,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "k_steps", "omega", "accel_w1",
                     "accel_w2", "accel_row", "ny", "band", "interpret"),
)
def run(
    f: jax.Array,
    mask_ext_f: jax.Array,
    *,
    mesh: Mesh,
    num_steps: int,
    k_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    ny: int,
    band: int | None = None,
    interpret: bool | None = None,
):
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")
    chunk = make_chunk_fn(
        mesh, k_steps=k_steps, omega=omega, accel_w1=accel_w1,
        accel_w2=accel_w2, accel_row=accel_row, ny=ny, band=band,
        interpret=interpret,
    )

    def body(carry, _):
        f_new, tots = chunk(carry, mask_ext_f)
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)


def simulate(
    params: Params,
    f,
    obstacle_mask,
    mesh: Mesh | None = None,
    *,
    k_steps: int = 4,
    band: int | None = None,
):
    """Full reference-semantics distributed simulation on the
    ghost-band + local-Pallas path. Same contract as d2q9.simulate."""
    if mesh is None:
        mesh = make_row_mesh()
    n_shards = mesh.devices.shape[0]
    aw = d2q9.AccelWeights.from_params(params)
    accel_row = params.ny - 2

    obstacle_np = np.asarray(obstacle_mask)
    f = jax.device_put(jnp.asarray(f), NamedSharding(mesh, P(None, ROW, None)))
    obstacle_sh = jax.device_put(
        jnp.asarray(obstacle_np), NamedSharding(mesh, P(ROW, None))
    )
    f = d2q9.first_accelerate(
        f, obstacle_sh, accel_row=accel_row, accel_w1=aw.w1, accel_w2=aw.w2
    )
    mask_ext_f = jax.device_put(
        jnp.asarray(extended_mask(obstacle_np, n_shards), f.dtype),
        NamedSharding(mesh, P(ROW, None)),
    )
    f_final, tot_u = run(
        f, mask_ext_f, mesh=mesh, num_steps=params.max_iters,
        k_steps=k_steps, omega=params.omega, accel_w1=aw.w1, accel_w2=aw.w2,
        accel_row=accel_row, ny=params.ny, band=band,
    )
    num_free = params.ny * params.nx - int(obstacle_np.sum())
    return f_final, tot_u / jnp.asarray(num_free, f.dtype)
