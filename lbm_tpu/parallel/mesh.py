"""Device-mesh construction for spatial domain decomposition.

The analogue of the reference's inter-IPU partitioning
(`grids::partitionForIpus`, main/include/StructuredGridUtils.hpp:472-561),
which splits the grid over {1,2,4,8,16} IPUs in a rows x cols pattern chosen
to minimise imbalance. Here the devices form a `jax.sharding.Mesh` with axes
('ry', 'rx') — grid rows sharded over 'ry', columns over 'rx' — and the
factorisation is chosen to keep shards close to square (minimum halo
perimeter per cell, hence minimum ICI traffic).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "ry"
COL_AXIS = "rx"


def best_factorisation(
    n_devices: int, ny: int, nx: int, *, require_even: bool = True,
    for_padding: bool = False,
) -> tuple[int, int]:
    """Pick (rows, cols) with rows*cols == n_devices minimising shard
    perimeter/area — the reference's row/col-imbalance heuristic
    (StructuredGridUtils.hpp:489-520) recast for halo traffic.

    require_even=True only admits factorisations that divide the grid
    exactly. require_even=False admits remainder splits (the analogue of the
    reference's remainder-row strategies, StructuredGridUtils.hpp:309-412).
    for_padding=True additionally restricts to factorisations the
    pad-and-mask RUNTIME can execute — shards take ceil-divided blocks and
    all padding must land in the LAST shard of each axis, i.e.
    (r-1)*ceil(ny/r) < ny; the planner's round-robin remainder splits
    (partition.partition_for_devices) have no such constraint and must not
    pass it. Prefers exact splits (zero waste), then lower halo traffic.
    """
    best = (n_devices, 1)
    best_cost = math.inf
    for r in range(1, n_devices + 1):
        if n_devices % r:
            continue
        c = n_devices // r
        if r > ny or c > nx:
            continue
        if require_even and (ny % r or nx % c):
            continue
        h = -(-ny // r)  # ceil
        w = -(-nx // c)
        if for_padding and ((r - 1) * h >= ny or (c - 1) * w >= nx):
            continue  # padding would spill beyond the last shard
        waste = (r * h * c * w - ny * nx) / (ny * nx)
        cost = 1 / h + 1 / w + waste  # halo cells per cell + padded fraction
        if cost < best_cost:
            best_cost = cost
            best = (r, c)
    if best_cost is math.inf:
        raise ValueError(
            f"cannot divide {ny}x{nx} grid evenly over {n_devices} devices"
            if require_even else
            f"no runnable factorisation of {n_devices} devices for a "
            f"{ny}x{nx} grid (shards would be pure padding)"
        )
    return best


def shard_padding(ny: int, nx: int, n_rows: int, n_cols: int) -> tuple[int, int]:
    """(pad_rows, pad_cols) to make a ny x nx grid divide an
    n_rows x n_cols mesh with ceil-sized shards. Padding always lands in the
    last shard of each axis; raises if a shard would be pure padding."""
    h = -(-ny // n_rows)
    w = -(-nx // n_cols)
    if (n_rows - 1) * h >= ny or (n_cols - 1) * w >= nx:
        raise ValueError(
            f"{ny}x{nx} on a {n_rows}x{n_cols} mesh: a whole shard would be "
            f"padding; use fewer devices along that axis"
        )
    return n_rows * h - ny, n_cols * w - nx


def pad_grid(params, f, obstacle_mask, pad_rows: int, pad_cols: int):
    """Pad-and-mask state construction shared by the uneven-grid runtimes
    (halo.simulate_sharded, pallas_sharded.simulate): padding cells hold the
    initial equilibrium (finite values), are masked as obstacles (excluded
    from Sum|u|, dynamics bounded by rebound) and sit after the real rows
    (top) / cols (east). Returns (f_padded, mask_padded) as numpy arrays."""
    import dataclasses

    from ..core import state

    f_np = np.asarray(f)
    new_ny, new_nx = params.ny + pad_rows, params.nx + pad_cols
    fpad = np.empty((9, new_ny, new_nx), f_np.dtype)
    fpad[:] = state.initial_distributions(
        dataclasses.replace(params, ny=new_ny, nx=new_nx), f_np.dtype)
    fpad[:, : params.ny, : params.nx] = f_np
    mask_pad = np.ones((new_ny, new_nx), bool)
    mask_pad[: params.ny, : params.nx] = np.asarray(obstacle_mask)
    return fpad, mask_pad


def make_mesh(n_devices: int | None = None, ny: int = 1024, nx: int = 1024,
              devices=None, *, require_even: bool = False) -> Mesh:
    """Mesh over the best (rows, cols) factorisation for a ny x nx grid.

    require_even=True restricts to exact splits — pass it from consumers
    that device_put WITHOUT pad-and-mask (implicit sharding), where an
    uneven factorisation would otherwise surface as an obscure JAX
    layout error instead of this clear ValueError."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    try:
        r, c = best_factorisation(n_devices, ny, nx)
    except ValueError:
        if require_even:
            raise
        # no exact split: the runtime runs uneven grids via pad-and-mask
        # (halo.simulate_sharded, strategy='ppermute')
        r, c = best_factorisation(n_devices, ny, nx, require_even=False,
                                  for_padding=True)
    dev_grid = np.array(devices[:n_devices]).reshape(r, c)
    return Mesh(dev_grid, (ROW_AXIS, COL_AXIS))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (9, ny, nx) state: speeds replicated, space sharded."""
    return NamedSharding(mesh, P(None, ROW_AXIS, COL_AXIS))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROW_AXIS, COL_AXIS))
