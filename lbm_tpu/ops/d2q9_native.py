"""ctypes bindings for the native serial D2Q9 engine (native/d2q9_serial.cpp).

The framework's independent host-side oracle — the native analogue of the
reference's serial golden standard (main/LastChance.cpp:120-288). Same
semantics contract as ops/d2q9.py (identical expression grouping, so f32
runs land in the same rounding class). Measured on this host: the full
40k-step 128x128 f64 golden run takes ~17.5 s (max rel err 3.7e-12 vs
check/) vs ~26 s for the jitted JAX CPU engine including its compile —
the oracle's real value is INDEPENDENCE (a second implementation with no
JAX in the loop), not raw speed.

No JAX dependency: everything here is numpy + ctypes. Falls back to
raising a clear error when the native toolchain is unavailable
(`available()` lets callers/tests skip gracefully).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..core.params import Params
from ..utils import native_io

_F64P = ctypes.POINTER(ctypes.c_double)
_F32P = ctypes.POINTER(ctypes.c_float)
_U8P = ctypes.POINTER(ctypes.c_ubyte)


def _engine_lib():
    nio = native_io.load()
    if nio is None:
        return None
    lib = nio._lib
    if not hasattr(lib, "d2q9_run_f64"):
        return None  # stale .so from before the engine existed
    if not getattr(lib, "_d2q9_typed", False):
        for suffix, fp, ct in (("f64", _F64P, ctypes.c_double),
                               ("f32", _F32P, ctypes.c_float)):
            run = getattr(lib, f"d2q9_run_{suffix}")
            run.restype = None
            run.argtypes = [fp, fp, _U8P, ctypes.c_long, ctypes.c_long,
                            ctypes.c_long, ct, ct, ct, ctypes.c_long, _F64P]
            fa = getattr(lib, f"d2q9_first_accelerate_{suffix}")
            fa.restype = None
            fa.argtypes = [fp, _U8P, ctypes.c_long, ctypes.c_long,
                           ctypes.c_long, ct, ct]
        lib._d2q9_typed = True
    return lib


def available() -> bool:
    return _engine_lib() is not None


def _require():
    lib = _engine_lib()
    if lib is None:
        raise RuntimeError(
            "native D2Q9 engine unavailable — build it with `make -C native` "
            "(needs a C++ toolchain); use --engine jax otherwise")
    return lib


def _check(f: np.ndarray, mask: np.ndarray):
    if f.dtype == np.float64:
        suffix, fp = "f64", _F64P
    elif f.dtype == np.float32:
        suffix, fp = "f32", _F32P
    else:
        raise ValueError(f"native engine supports float32/float64, not {f.dtype}")
    if f.ndim != 3 or f.shape[0] != 9 or f.shape[1:] != mask.shape:
        raise ValueError(f"f shape {f.shape} does not match mask {mask.shape}")
    return suffix, fp


def first_accelerate(f: np.ndarray, mask: np.ndarray, *, accel_row: int,
                     accel_w1: float, accel_w2: float) -> None:
    """In-place guarded acceleration of `accel_row` (f: contiguous (9,ny,nx))."""
    lib = _require()
    suffix, fp = _check(f, mask)
    obs = np.ascontiguousarray(mask, np.uint8)
    getattr(lib, f"d2q9_first_accelerate_{suffix}")(
        f.ctypes.data_as(fp), obs.ctypes.data_as(_U8P),
        f.shape[1], f.shape[2], accel_row, accel_w1, accel_w2)


def run(f: np.ndarray, mask: np.ndarray, *, num_steps: int, omega: float,
        accel_w1: float, accel_w2: float, accel_row: int) -> np.ndarray:
    """`num_steps` timesteps in place on `f`; returns per-step tot_u (f64).

    Chunked calls are bit-identical to one call of the combined length
    (plain serial loop — no cross-step state beyond `f` itself).
    """
    lib = _require()
    suffix, fp = _check(f, mask)
    if not f.flags.c_contiguous:
        raise ValueError("f must be C-contiguous (it is advanced in place)")
    obs = np.ascontiguousarray(mask, np.uint8)
    scratch = np.empty_like(f)
    tot_u = np.empty(num_steps, np.float64)
    getattr(lib, f"d2q9_run_{suffix}")(
        f.ctypes.data_as(fp), scratch.ctypes.data_as(fp),
        obs.ctypes.data_as(_U8P), f.shape[1], f.shape[2], num_steps,
        omega, accel_w1, accel_w2, accel_row,
        tot_u.ctypes.data_as(_F64P))
    return tot_u


def simulate(params: Params, f: np.ndarray, mask: np.ndarray):
    """Full reference-semantics run; mirrors ops/d2q9.simulate.

    Returns (f_final, av_vels) as numpy arrays; av_vels is divided by the
    free-cell count in the state dtype (matching the JAX engines' division
    precision) and returned as float64. The input `f` is NOT mutated
    (unlike the lower-level `run`, which advances in place).
    """
    from . import d2q9  # AccelWeights only — no jax work happens here

    aw = d2q9.AccelWeights.from_params(params)
    accel_row = params.ny - 2
    f = np.array(f, order="C", copy=True)
    first_accelerate(f, mask, accel_row=accel_row,
                     accel_w1=aw.w1, accel_w2=aw.w2)
    tot_u = run(f, mask, num_steps=params.max_iters, omega=params.omega,
                accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row)
    num_free = f.dtype.type((~np.asarray(mask, bool)).sum())
    av_vels = (tot_u.astype(f.dtype) / num_free).astype(np.float64)
    return f, av_vels
