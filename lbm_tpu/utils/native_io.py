"""ctypes bindings for the native I/O library (native/lbmio.cpp).

Builds liblbmio.so on first use if a toolchain is available; all callers
fall back to the pure-Python writers when the library can't be loaded.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "liblbmio.so"


class NativeIO:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.lbmio_write_final_state.restype = ctypes.c_int
        lib.lbmio_write_av_vels.restype = ctypes.c_int
        lib.lbmio_read_obstacles.restype = ctypes.c_long

    def write_final_state(self, path: str, u_x, u_y, u, pressure, obstacle) -> None:
        ny, nx = obstacle.shape
        arrs = [np.ascontiguousarray(a, dtype=np.float64) for a in (u_x, u_y, u, pressure)]
        obs = np.ascontiguousarray(obstacle, dtype=np.uint8)
        ret = self._lib.lbmio_write_final_state(
            path.encode(),
            *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for a in arrs),
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.c_long(ny), ctypes.c_long(nx),
        )
        if ret != 0:
            raise OSError(f"native write_final_state failed for {path}")

    def write_av_vels(self, path: str, vals) -> None:
        v = np.ascontiguousarray(vals, dtype=np.float64)
        ret = self._lib.lbmio_write_av_vels(
            path.encode(),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_long(v.size),
        )
        if ret != 0:
            raise OSError(f"native write_av_vels failed for {path}")

    def read_obstacles(self, path: str, ny: int, nx: int) -> np.ndarray:
        mask = np.zeros((ny, nx), dtype=np.uint8)
        count = self._lib.lbmio_read_obstacles(
            path.encode(),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.c_long(ny), ctypes.c_long(nx),
        )
        if count < 0:
            raise ValueError(f"native read_obstacles failed for {path}")
        return mask.astype(bool)


def build() -> bool:
    """Compile liblbmio.so; returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", str(NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return LIB_PATH.exists()
    except Exception:
        return False


_CACHED: dict[bool, NativeIO | None] = {}


def _lib_is_fresh() -> bool:
    if not LIB_PATH.exists():
        return False
    mtime = LIB_PATH.stat().st_mtime
    return all(mtime >= src.stat().st_mtime
               for src in NATIVE_DIR.glob("*.cpp"))


def load(auto_build: bool = True) -> NativeIO | None:
    """Memoized: dlopen once per process. Rebuilds when lbmio.cpp is newer
    than the library (the .so is a local build artifact, never shipped)."""
    if auto_build in _CACHED:
        return _CACHED[auto_build]
    result = None
    if _lib_is_fresh() or (auto_build and build()):
        try:
            result = NativeIO(ctypes.CDLL(str(LIB_PATH)))
        except OSError:
            result = None
    _CACHED[auto_build] = result
    return result
