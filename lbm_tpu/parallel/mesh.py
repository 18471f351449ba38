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
    n_devices: int, ny: int, nx: int, *, require_even: bool = True
) -> tuple[int, int]:
    """Pick (rows, cols) with rows*cols == n_devices minimising shard
    perimeter/area — the reference's row/col-imbalance heuristic
    (StructuredGridUtils.hpp:489-520) recast for halo traffic.

    require_even=True (the shard_map case) only admits factorisations that
    divide the grid exactly; the planner (partition.py) can relax this, like
    the reference's remainder-row strategies (StructuredGridUtils.hpp:309-412).
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
        h, w = ny / r, nx / c
        cost = 1 / h + 1 / w  # halo cells per interior cell
        if cost < best_cost:
            best_cost = cost
            best = (r, c)
    if best_cost is math.inf:
        raise ValueError(
            f"cannot divide {ny}x{nx} grid evenly over {n_devices} devices"
        )
    return best


def make_mesh(n_devices: int | None = None, ny: int = 1024, nx: int = 1024,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    r, c = best_factorisation(n_devices, ny, nx)
    dev_grid = np.array(devices[:n_devices]).reshape(r, c)
    return Mesh(dev_grid, (ROW_AXIS, COL_AXIS))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (9, ny, nx) state: speeds replicated, space sharded."""
    return NamedSharding(mesh, P(None, ROW_AXIS, COL_AXIS))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROW_AXIS, COL_AXIS))
