"""End-to-end Gaussian-blur driver (reference: main/GaussianBlurCpu.cpp,
GaussianBlurLowLevel.cpp, GaussianBlurPoplibs.cpp)."""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil
from ..utils import image as img_lib


def blur_image(
    rgba: np.ndarray,
    *,
    num_iters: int = 100,
    engine: str = "conv",
    dtype=jnp.float32,
    blur_alpha: bool = False,
    num_devices: int | None = None,
    band: int | None = None,
    k_passes: int | None = None,
) -> tuple[np.ndarray, float]:
    """Normalise, pad, run num_iters x2 blur passes, denormalise.
    Returns (blurred RGBA uint8, compute_seconds). By default the alpha
    channel is left untouched, like the reference CPU driver
    (GaussianBlurCpu.cpp:77 loops c < NumChannels-1).

    engine='conv-sharded' runs the conv engine on an image sharded over a
    device mesh with XLA-implicit halo exchange — the multi-chip blur the
    reference scaled to 16 IPUs (experiments/gaussian-blur-scaling)."""
    fimg = img_lib.to_float_image(rgba)
    # row_mult 32 (not the minimal 8) gives the banded engines a richer set
    # of band choices — heights like leaf's 1026 -> 1032 admit only 8-row
    # bands (3x halo read amplification); 1056 admits 32/96/... The extra
    # masked rows are free.
    padded, interior, (h, w) = img_lib.pad_to_tile(fimg.intensities,
                                                   row_mult=32)

    x = jnp.asarray(padded, dtype)
    inter = jnp.asarray(interior, dtype)

    if engine == "auto":
        # fastest measured engine per size (docs/TUNING.md): VMEM-resident
        # when the image fits, else temporal-blocked banded kernel
        if stencil.resident_fits(x):
            engine = "resident"
        else:
            engine = "pallas"
            if k_passes is None:
                k_passes = next(
                    (k for k in (4, 2) if (2 * num_iters) % k == 0), None)

    if engine == "conv-sharded":
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh as mesh_lib

        n = num_devices or len(jax.devices())
        # implicit sharding: no pad-and-mask, so only exact splits lay out
        mesh = mesh_lib.make_mesh(n, padded.shape[1], padded.shape[2],
                                  require_even=True)
        x = jax.device_put(x, NamedSharding(
            mesh, P(None, mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS)))
        inter = jax.device_put(inter, NamedSharding(
            mesh, P(mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS)))
        engine = "conv"

    out = stencil.blur_many(x, inter, num_iters=num_iters,
                            engine=engine, band=band, k_passes=k_passes)
    np.asarray(out)  # materialize: warm-up/compile

    t0 = time.perf_counter()
    out = stencil.blur_many(x, inter, num_iters=num_iters,
                            engine=engine, band=band, k_passes=k_passes)
    out_np = np.asarray(out, dtype=np.float32)
    compute_seconds = time.perf_counter() - t0

    blurred = out_np[:, 1 : 1 + h, 1 : 1 + w].copy()  # jax buffers are read-only
    if not blur_alpha:
        blurred[3] = fimg.intensities[3]
    result = img_lib.to_char_image(
        img_lib.FloatImage(blurred, fimg.orig_chan_min, fimg.orig_chan_max)
    )
    return result, compute_seconds


def blur_file(
    in_path: str | Path,
    out_path: str | Path,
    **kw,
) -> float:
    rgba = img_lib.load_png(in_path)
    blurred, seconds = blur_image(rgba, **kw)
    img_lib.save_png(out_path, blurred)
    return seconds
