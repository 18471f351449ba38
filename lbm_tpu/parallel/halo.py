"""Halo exchange over the TPU mesh: shard_map + ppermute rings.

The reference benchmarked five halo-exchange strategies on the IPU
(main/HaloRegionApproaches.cpp) and found compiler-scheduled "implicit"
exchange fastest, with the two-wave explicit variant (N-S wave then E-W wave,
corners riding the waves, :359-519) the best explicit scheme. The TPU
equivalents implemented here:

  * ``implicit``  — apply the global-`jnp.roll` step to a sharded array under
    plain jit; XLA inserts the halo collectives itself.
  * ``ppermute``  — explicit `shard_map` step: one N-S `lax.ppermute` wave of
    boundary rows, then one E-W wave of boundary columns of the row-extended
    block, so the corner speeds cross diagonally in two hops (the 2Wave
    trick). Periodic wraparound falls out of the ring permutation.
  * ``manytensors`` — persistent ghost-extended blocks whose 8 ghost regions
    are overwritten by per-direction sends (explicitManyTensors analogue).
  * ``allgather`` / ``naive`` — deliberately-heavy baselines (see below).

Both preserve the exact single-device semantics: a step on an N-device mesh
equals the global step (tested on an 8-virtual-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import Params
from ..ops import d2q9
from . import mesh as mesh_lib

ROW, COL = mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS


def ring_shift(x: jax.Array, axis_name: str, direction: int) -> jax.Array:
    """Pass `x` to the neighbour `direction` steps along the named mesh axis
    (periodic). direction=+1: data moves to the next-higher index."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + direction) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def exchange_halos_2wave(f_loc: jax.Array) -> jax.Array:
    """(9, h, w) local block -> (9, h+2, w+2) with periodic ghost ring.

    Wave 1 (N-S): boundary rows ride the 'ry' ring. Wave 2 (E-W): boundary
    columns of the row-extended block ride the 'rx' ring — ghost corners
    arrive via two hops, never a diagonal send (the 2Wave insight,
    HaloRegionApproaches.cpp:359-519).
    """
    # wave 1: rows. ghost row below = real top row of the southern neighbour.
    top = f_loc[:, -1:, :]   # our northmost row -> becomes neighbour's south ghost
    bot = f_loc[:, :1, :]
    ghost_south = ring_shift(top, ROW, +1)  # from row-shard i-1
    ghost_north = ring_shift(bot, ROW, -1)  # from row-shard i+1
    ext = jnp.concatenate([ghost_south, f_loc, ghost_north], axis=1)

    # wave 2: columns of the extended block (corners included).
    left = ext[:, :, -1:]
    right = ext[:, :, :1]
    ghost_west = ring_shift(left, COL, +1)
    ghost_east = ring_shift(right, COL, -1)
    return jnp.concatenate([ghost_west, ext, ghost_east], axis=2)


def _stream_from_ext(ext: jax.Array, h: int, w: int) -> tuple[jax.Array, ...]:
    """Pull-streaming by slicing the ghost-extended block: speed k at local
    cell (jj, ii) = ext[k, jj+1-dy, ii+1-dx]."""

    def sl(dy, dx):
        return lambda k: ext[k, 1 - dy : 1 - dy + h, 1 - dx : 1 - dx + w]

    mid, e, n, wst, s_ = sl(0, 0), sl(0, 1), sl(1, 0), sl(0, -1), sl(-1, 0)
    ne, nw, sw, se = sl(1, 1), sl(1, -1), sl(-1, -1), sl(-1, 1)
    return (mid(0), e(1), n(2), wst(3), s_(4), ne(5), nw(6), sw(7), se(8))


def exchange_halos_allgather(f_loc: jax.Array) -> jax.Array:
    """Same contract as exchange_halos_2wave, but each shard all-gathers the
    boundary rows/cols of EVERY shard and selects its neighbours' — the
    deliberately-heavy strategy, kept as the analogue of the reference's
    worst performer `explicitOneTensor` (HaloRegionApproaches.cpp:522-738)
    for the strategy-comparison experiment."""
    nr = jax.lax.psum(1, ROW)
    my_r = jax.lax.axis_index(ROW)
    # all shards' top/bottom rows: (nr, 9, 1, w)
    tops = jax.lax.all_gather(f_loc[:, -1:, :], ROW)
    bots = jax.lax.all_gather(f_loc[:, :1, :], ROW)
    ghost_south = tops[(my_r - 1) % nr]
    ghost_north = bots[(my_r + 1) % nr]
    ext = jnp.concatenate([ghost_south, f_loc, ghost_north], axis=1)

    nc = jax.lax.psum(1, COL)
    my_c = jax.lax.axis_index(COL)
    lefts = jax.lax.all_gather(ext[:, :, -1:], COL)
    rights = jax.lax.all_gather(ext[:, :, :1], COL)
    ghost_west = lefts[(my_c - 1) % nc]
    ghost_east = rights[(my_c + 1) % nc]
    return jnp.concatenate([ghost_west, ext, ghost_east], axis=2)


def exchange_halos_naive(f_loc: jax.Array) -> jax.Array:
    """Deliberately-chatty exchange: every edge AND every corner is its own
    collective (12 total: 4 edges + 4 corners x 2 hops), strictly
    serialised by data dependencies so nothing batches or overlaps.

    The analogue of the reference's worst performer `explicitOneTensor`
    (HaloRegionApproaches.cpp:522-738): per-direction sequential copies
    serialised into 99.9% sync time — 178,569,036 cycles vs 21,010 for the
    compiler-scheduled implicit scheme (experiments/halo-exchange-approaches/
    results.csv). Kept to reproduce that headline lesson on TPU; correct
    physics, never use it for production.
    """
    _, h, w = f_loc.shape
    zero = jnp.zeros((), f_loc.dtype)

    def send(x, axis, direction, token):
        # `token` is 0.0 but data-depends on the previous collective; the
        # optimization_barrier stops XLA folding the +0 away, forcing the
        # 12 collectives into a serial chain
        g = ring_shift(x + token, axis, direction)
        new_token = jax.lax.optimization_barrier(g[0, 0, 0] * zero)
        return g, new_token

    t = zero
    ghost_s, t = send(f_loc[:, -1:, :], ROW, +1, t)
    ghost_n, t = send(f_loc[:, :1, :], ROW, -1, t)
    ghost_w, t = send(f_loc[:, :, -1:], COL, +1, t)
    ghost_e, t = send(f_loc[:, :, :1], COL, -1, t)

    def corner(cell, row_dir, col_dir, token):
        x, token = send(cell, ROW, row_dir, token)
        return send(x, COL, col_dir, token)

    c_sw, t = corner(f_loc[:, -1:, -1:], +1, +1, t)  # from (ri-1, ci-1)
    c_se, t = corner(f_loc[:, -1:, :1], +1, -1, t)   # from (ri-1, ci+1)
    c_nw, t = corner(f_loc[:, :1, -1:], -1, +1, t)   # from (ri+1, ci-1)
    c_ne, t = corner(f_loc[:, :1, :1], -1, -1, t)    # from (ri+1, ci+1)

    bottom = jnp.concatenate([c_sw, ghost_s, c_se], axis=2)
    middle = jnp.concatenate([ghost_w, f_loc, ghost_e], axis=2)
    top = jnp.concatenate([c_nw, ghost_n, c_ne], axis=2)
    return jnp.concatenate([bottom, middle, top], axis=1)


def exchange_halos_manytensors(f_loc: jax.Array) -> jax.Array:
    """Persistent-ghost-buffer strategy: the shard's block lives ghost-
    extended ((9, h+2, w+2)) and its 8 ghost regions are overwritten by
    per-direction messages — 4 corner-free edge sends plus 4 one-cell
    corner sends (each corner routed as two axis hops, since ppermute
    moves along one mesh axis) — each written into the extended block
    with dynamic_update_slice rather than rebuilt by concatenation.

    The analogue of the reference's ``explicitManyTensors``
    (HaloRegionApproaches.cpp:166-357): per-tile (b+2)^2 tensors updated
    by an 8-direction Copy program. Unlike 'naive' there is no artificial
    serialisation chain — XLA may batch/overlap the 12 collectives the way
    Poplar batches the per-direction copies (315,370 cycles on the IPU,
    experiments/halo-exchange-approaches, vs 178M for the serialised
    ordering). Ghost contents are identical to exchange_halos_2wave."""
    _, h, w = f_loc.shape
    ext = jnp.pad(f_loc, ((0, 0), (1, 1), (1, 1)))

    # 4 edge messages, corners excluded (each its own send)
    ghost_s = ring_shift(f_loc[:, -1:, :], ROW, +1)   # from row-shard i-1
    ghost_n = ring_shift(f_loc[:, :1, :], ROW, -1)    # from row-shard i+1
    ghost_w = ring_shift(f_loc[:, :, -1:], COL, +1)
    ghost_e = ring_shift(f_loc[:, :, :1], COL, -1)
    ext = jax.lax.dynamic_update_slice(ext, ghost_s, (0, 0, 1))
    ext = jax.lax.dynamic_update_slice(ext, ghost_n, (0, h + 1, 1))
    ext = jax.lax.dynamic_update_slice(ext, ghost_w, (0, 1, 0))
    ext = jax.lax.dynamic_update_slice(ext, ghost_e, (0, 1, w + 1))

    # 4 single-cell corner messages (diagonal neighbour via two hops)
    c_sw = ring_shift(ring_shift(f_loc[:, -1:, -1:], ROW, +1), COL, +1)
    c_se = ring_shift(ring_shift(f_loc[:, -1:, :1], ROW, +1), COL, -1)
    c_nw = ring_shift(ring_shift(f_loc[:, :1, -1:], ROW, -1), COL, +1)
    c_ne = ring_shift(ring_shift(f_loc[:, :1, :1], ROW, -1), COL, -1)
    ext = jax.lax.dynamic_update_slice(ext, c_sw, (0, 0, 0))
    ext = jax.lax.dynamic_update_slice(ext, c_se, (0, 0, w + 1))
    ext = jax.lax.dynamic_update_slice(ext, c_nw, (0, h + 1, 0))
    ext = jax.lax.dynamic_update_slice(ext, c_ne, (0, h + 1, w + 1))
    return ext


def exchange_halos_none(f_loc: jax.Array) -> jax.Array:
    """Local-periodic ghost ring WITHOUT any inter-shard communication.
    Physically wrong at shard boundaries — exists only as the zero-exchange
    cost baseline for the exchange-vs-compute experiment (the analogue of
    the reference's profiler split, experiments/gaussian-blur-scaling/
    exchange-vs-compute.csv)."""
    ext = jnp.concatenate([f_loc[:, -1:, :], f_loc, f_loc[:, :1, :]], axis=1)
    return jnp.concatenate([ext[:, :, -1:], ext, ext[:, :, :1]], axis=2)


def exchange_halos_2wave_padded(f_loc: jax.Array, pad_rows: int,
                                pad_cols: int) -> jax.Array:
    """2-wave exchange for pad-and-mask uneven grids (the runtime analogue of
    the reference's remainder-row strategies, StructuredGridUtils.hpp:309-412).

    The global grid is padded so it divides the mesh; all padding sits at the
    top of the LAST row-shard / the east of the LAST column-shard. The torus
    therefore wraps at each shard's top *valid* row/col, not its block edge:
    every shard sends its top valid row (dynamic-sliced — only the last shard
    differs) and each receiver writes the incoming north/east ghost at its own
    valid edge + 1 via dynamic_update_slice (a no-op position for unpadded
    shards, overwriting a padding row/col on the last). Cells above/right of
    the ghost are dead padding: masked as obstacles, excluded from Sum|u|,
    never read by valid cells (the pull stencil is +-1).
    """
    _, h, w = f_loc.shape
    nr = jax.lax.psum(1, ROW)
    is_last_r = jax.lax.axis_index(ROW) == nr - 1
    tv = h - 1 - jnp.where(is_last_r, pad_rows, 0)  # my top valid row

    top = jax.lax.dynamic_slice(f_loc, (0, tv, 0), (9, 1, w))
    ghost_south = ring_shift(top, ROW, +1)
    ghost_north = ring_shift(f_loc[:, :1, :], ROW, -1)
    ext = jnp.concatenate([ghost_south, f_loc, ghost_north], axis=1)
    # place the north ghost just above my top valid row (ext row tv+2;
    # equals the appended position h+1 when I carry no padding)
    ext = jax.lax.dynamic_update_slice(ext, ghost_north, (0, tv + 2, 0))

    nc = jax.lax.psum(1, COL)
    is_last_c = jax.lax.axis_index(COL) == nc - 1
    lv = w - 1 - jnp.where(is_last_c, pad_cols, 0)  # my east valid col
    right = jax.lax.dynamic_slice(ext, (0, 0, lv), (9, h + 2, 1))
    ghost_west = ring_shift(right, COL, +1)
    ghost_east = ring_shift(ext[:, :, :1], COL, -1)
    ext = jnp.concatenate([ghost_west, ext, ghost_east], axis=2)
    return jax.lax.dynamic_update_slice(ext, ghost_east, (0, 0, lv + 2))


EXCHANGES = {
    "ppermute": exchange_halos_2wave,
    "manytensors": exchange_halos_manytensors,
    "allgather": exchange_halos_allgather,
    "naive": exchange_halos_naive,
    "none": exchange_halos_none,
}


def make_sharded_step(
    mesh: Mesh,
    *,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    exchange: str = "ppermute",
    pad_rows: int = 0,
    pad_cols: int = 0,
):
    """Explicit-exchange distributed step: f (9,ny,nx) sharded over
    (ry, rx); returns (f', tot_u) with tot_u psum'd across the mesh —
    the analogue of the reference's distributed averageVelocity reduction
    (main/LbmAoS.cpp:25-93). pad_rows/pad_cols > 0 selects the pad-and-mask
    uneven-grid exchange (ppermute only)."""
    if (pad_rows or pad_cols) and exchange != "ppermute":
        raise ValueError(
            f"uneven grids (padding) support only the 'ppermute' strategy, "
            f"not {exchange!r}"
        )
    if pad_rows or pad_cols:
        exchange_fn = functools.partial(
            exchange_halos_2wave_padded, pad_rows=pad_rows, pad_cols=pad_cols
        )
    else:
        exchange_fn = EXCHANGES[exchange]

    def local_step(f_loc, mask_loc, amask_loc):
        _, h, w = f_loc.shape
        ext = exchange_fn(f_loc)
        s = _stream_from_ext(ext, h, w)
        f_new, tot_loc = d2q9.collide(
            s, mask_loc, amask_loc,
            omega=omega, accel_w1=accel_w1, accel_w2=accel_w2,
        )
        tot = jax.lax.psum(tot_loc, (ROW, COL))
        return f_new, tot

    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, ROW, COL), P(ROW, COL), P(ROW, None)),
        out_specs=(P(None, ROW, COL), P()),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "omega", "accel_w1", "accel_w2",
                     "unroll", "exchange", "pad_rows", "pad_cols"),
)
def run_sharded(
    f: jax.Array,
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    mesh: Mesh,
    num_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    unroll: int = 1,
    exchange: str = "ppermute",
    pad_rows: int = 0,
    pad_cols: int = 0,
):
    """Device-resident multi-chip scan over the explicit-halo step."""
    step_fn = make_sharded_step(
        mesh, omega=omega, accel_w1=accel_w1, accel_w2=accel_w2,
        exchange=exchange, pad_rows=pad_rows, pad_cols=pad_cols,
    )

    def body(carry, _):
        f_new, tot = step_fn(carry, obstacle_mask, accel_mask)
        return f_new, tot

    return jax.lax.scan(body, f, None, length=num_steps, unroll=unroll)


def prepare_sharded(
    params: Params,
    f,
    obstacle_mask,
    mesh: Mesh,
    strategy: str = "ppermute",
    *,
    first_accelerate: bool = True,
):
    """Lay the state out on the mesh ready for run_sharded: pad-and-mask if
    the grid does not divide the mesh, device_put with the grid shardings,
    apply the one-off guarded acceleration (skip with
    first_accelerate=False when resuming from a checkpoint — the state is
    already accelerated). Returns (f_sh, padded_mask_sh, amask_sh,
    (pad_rows, pad_cols))."""
    aw = d2q9.AccelWeights.from_params(params)
    accel_row = params.ny - 2
    ny, nx = params.ny, params.nx
    n_r, n_c = mesh.devices.shape

    pad_r = pad_c = 0
    if ny % n_r or nx % n_c:
        if strategy == "implicit":
            # device_put rejects non-divisible NamedShardings in this JAX
            # version, and padding would route the implicit jnp.roll
            # wraparound through dead cells
            raise ValueError(
                f"{ny}x{nx} does not divide the {n_r}x{n_c} mesh; the "
                "'implicit' strategy cannot lay out uneven shards — use "
                "strategy='ppermute' (pad-and-mask)"
            )
        pad_r, pad_c = mesh_lib.shard_padding(ny, nx, n_r, n_c)
        # padding cells are equilibrium-filled obstacles, never read by
        # valid cells (the padded exchange wraps at the valid edge)
        f, padded_mask = mesh_lib.pad_grid(params, f, obstacle_mask,
                                           pad_r, pad_c)
    else:
        padded_mask = obstacle_mask

    f = jax.device_put(jnp.asarray(f), mesh_lib.grid_sharding(mesh))
    padded_mask = jax.device_put(jnp.asarray(padded_mask),
                                 mesh_lib.mask_sharding(mesh))
    if first_accelerate:
        f = d2q9.first_accelerate(
            f, padded_mask, accel_row=accel_row,
            accel_w1=aw.w1, accel_w2=aw.w2,
        )
    amask = d2q9.accel_row_mask(ny + pad_r, nx + pad_c, accel_row,
                                dtype=f.dtype)
    amask = jax.device_put(amask, NamedSharding(mesh, P(ROW, None)))
    return f, padded_mask, amask, (pad_r, pad_c)


def simulate_sharded(
    params: Params,
    f,
    obstacle_mask,
    mesh: Mesh,
    *,
    strategy: str = "ppermute",
    unroll: int = 1,
    allow_invalid: bool = False,
):
    """Full reference-semantics simulation on a device mesh.

    strategy='ppermute': explicit shard_map halo rings (this module).
    strategy='implicit': global step on sharded arrays; XLA chooses the
    collectives (the reference's winning "implicit" scheme).
    strategy='allgather': deliberately-heavy gather-everything baseline.
    ('none' is a physically-WRONG zero-communication cost baseline and is
    rejected here; only the exchange-vs-compute experiment uses it via
    allow_invalid=True.)

    Grids that do not divide the mesh run via pad-and-mask (ppermute; the
    reference ran any grid on any IPU count, StructuredGridUtils.hpp:472-561)
    or natively via GSPMD's uneven sharding (implicit).
    """
    f, padded_mask, amask, (pad_r, pad_c) = prepare_sharded(
        params, f, obstacle_mask, mesh, strategy
    )
    aw = d2q9.AccelWeights.from_params(params)
    ny, nx = params.ny, params.nx

    if strategy == "none" and not allow_invalid:
        raise ValueError(
            "'none' skips halo exchange and gives wrong physics; it is a "
            "cost baseline only (pass allow_invalid=True if you mean it)"
        )
    if strategy in EXCHANGES:
        f_final, tot_u = run_sharded(
            f, padded_mask, amask,
            mesh=mesh, num_steps=params.max_iters,
            omega=params.omega, accel_w1=aw.w1, accel_w2=aw.w2, unroll=unroll,
            exchange=strategy, pad_rows=pad_r, pad_cols=pad_c,
        )
    elif strategy == "implicit":
        f_final, tot_u = d2q9.run(
            f, padded_mask, amask,
            num_steps=params.max_iters,
            omega=params.omega, accel_w1=aw.w1, accel_w2=aw.w2, unroll=unroll,
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    if pad_r or pad_c:
        f_final = f_final[:, :ny, :nx]
    num_free = jnp.asarray((~jnp.asarray(obstacle_mask)).sum(), dtype=f.dtype)
    return f_final, tot_u / num_free
