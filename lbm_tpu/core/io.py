"""Exact-format `.dat` output writers / readers.

Formats replicate the reference so its golden files and checker work
unchanged:
  * av_vels.dat     — `<step>:\\t<%.12E>` per line
                      (reference: main/LastChance.cpp:627-630,
                       main/include/LatticeBoltzmannUtils.hpp:208-219)
  * final_state.dat — `x y u_x u_y u pressure obstacle` per cell, %.12E floats
                      (reference: main/LastChance.cpp:571-616,
                       main/include/LatticeBoltzmannUtils.hpp:221-281)

Note: the reference's writer prints the obstacle column with a transposed
index (`obstacles[ii * nx + jj]`, main/LastChance.cpp:614 — a bug). We write
the correct flag; the checker only compares columns 0, 1 and 5, so golden
comparisons are unaffected.

A native C++ writer (native/lbmio.cpp) accelerates the megacell-scale
final_state dump; this module transparently falls back to pure Python.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .params import Params
from .state import macroscopics

C_SQ = 1.0 / 3.0  # square of speed of sound


def write_av_vels(path: str | Path, av_vels: np.ndarray) -> None:
    native = _try_native()
    if native is not None:
        native.write_av_vels(str(path), np.asarray(av_vels))
        return
    with open(path, "w") as fh:
        fh.writelines(f"{i}:\t{float(v):.12E}\n" for i, v in enumerate(np.asarray(av_vels)))


def read_av_vels(path: str | Path) -> np.ndarray:
    vals = []
    for line in Path(path).read_text().splitlines():
        if line:
            vals.append(float(line.split(":\t")[1]))
    return np.asarray(vals, dtype=np.float64)


def final_state_fields(params: Params, obstacle_mask: np.ndarray, f: np.ndarray):
    """Per-cell (u_x, u_y, u, pressure) with obstacle-cell conventions applied."""
    dtype = f.dtype
    _, u_x, u_y, u = macroscopics(f)
    rho = f.sum(axis=0, dtype=dtype)
    c_sq = np.asarray(1.0, dtype=dtype) / np.asarray(3.0, dtype=dtype)
    pressure = rho * c_sq
    obs_pressure = np.asarray(params.density, dtype=dtype) * c_sq
    zero = np.asarray(0.0, dtype=dtype)
    u_x = np.where(obstacle_mask, zero, u_x)
    u_y = np.where(obstacle_mask, zero, u_y)
    u = np.where(obstacle_mask, zero, u)
    pressure = np.where(obstacle_mask, obs_pressure, pressure)
    return u_x, u_y, u, pressure


def write_final_state_arrays(path: str | Path, u_x, u_y, u, pressure,
                             obstacle_mask) -> None:
    """Write pre-computed per-cell fields in the exact final_state.dat
    format (`x y u_x u_y u pressure obstacle`, %.12E). The single home of
    the row format — used by the 2-D writer below and the 3-D slice
    writer (models/lbm3d.py). Native fast path when available."""
    ny, nx = obstacle_mask.shape
    native = _try_native()
    if native is not None:
        native.write_final_state(str(path), u_x, u_y, u, pressure, obstacle_mask)
        return
    with open(path, "w") as fh:
        for jj in range(ny):
            ux_r, uy_r, u_r, p_r, o_r = u_x[jj], u_y[jj], u[jj], pressure[jj], obstacle_mask[jj]
            fh.writelines(
                f"{ii} {jj} {float(ux_r[ii]):.12E} {float(uy_r[ii]):.12E}"
                f" {float(u_r[ii]):.12E} {float(p_r[ii]):.12E} {int(o_r[ii])}\n"
                for ii in range(nx)
            )


def write_final_state(
    path: str | Path, params: Params, obstacle_mask: np.ndarray, f: np.ndarray
) -> None:
    u_x, u_y, u, pressure = final_state_fields(params, obstacle_mask, f)
    write_final_state_arrays(path, u_x, u_y, u, pressure, obstacle_mask)


def read_final_state(path: str | Path) -> np.ndarray:
    """Returns an (N, 7) float64 array of the final_state columns."""
    return np.loadtxt(path, dtype=np.float64, ndmin=2)


_NATIVE = None
_NATIVE_CHECKED = False


def _try_native():
    """Load the optional native I/O library (built from native/lbmio.cpp)."""
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from ..utils import native_io

            _NATIVE = native_io.load()
        except Exception:
            _NATIVE = None
    return _NATIVE
