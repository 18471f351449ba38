"""D3Q19 lattice constants and state initialisation — numpy only.

Shared by the JAX engines (ops/d3q19.py), the native serial oracle
(ops/d3q19_native.py) and the 3-D drivers (models/lbm3d.py); kept free of
any JAX import so the no-JAX native path stays genuinely JAX-free.

Axis order (z, y, x); speed k has unit velocity E[k] = (dz, dy, dx).
Weights: 1/3 (rest), 1/18 (6 axis), 1/36 (12 edge).
"""

from __future__ import annotations

import numpy as np

_E = [(0, 0, 0)]
_E += [(0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0), (1, 0, 0), (-1, 0, 0)]
_E += [
    (0, 1, 1), (0, 1, -1), (0, -1, 1), (0, -1, -1),
    (1, 0, 1), (1, 0, -1), (-1, 0, 1), (-1, 0, -1),
    (1, 1, 0), (1, -1, 0), (-1, 1, 0), (-1, -1, 0),
]
E = np.array(_E, dtype=np.int32)  # (19, 3) as (dz, dy, dx)
W = np.array([1 / 3] + [1 / 18] * 6 + [1 / 36] * 12)
OPPOSITE = np.array(
    [int(np.where((E == -E[k]).all(axis=1))[0][0]) for k in range(19)],
    dtype=np.int32,
)
NUM_SPEEDS = 19


def initial_distributions(nz: int, ny: int, nx: int, density: float = 0.1,
                          dtype=np.float32) -> np.ndarray:
    f = np.empty((NUM_SPEEDS, nz, ny, nx), dtype=dtype)
    for k in range(NUM_SPEEDS):
        f[k] = dtype(density * W[k])
    return f
