"""Manually pipelined variant of the fused K-step D2Q9 kernel.

Same maths and band decomposition as `d2q9_pallas` (the TPU analogue of the
reference's `LbmTimeStepVertex`, main/codelets/D2Q9Codelets.cpp:94-191), but
the HBM<->VMEM movement is explicit: the kernel runs with an empty grid,
loops over row bands with `fori_loop`, and double-buffers `make_async_copy`
DMAs so band i+1's fetch and band i-1's write-back are in flight while band
i computes.

Why it exists: experiments/d2q9-breakdown measured the automatic
pallas_call pipeline at wall = copy + compute EXACTLY (zero overlap) on
every non-resident grid, leaving ~35% of the 4096^2 wall on the table;
experiments/d2q9-overlap probes whether explicit double buffering recovers
the overlap. This module is the production-shaped version of that probe's
`manual` engine: identical kernel contract to `d2q9_pallas.stepk` (scal
plumbing, K-step temporal blocking with 8-row wraparound halo fetches,
per-step Sum|u| partials in SMEM) so the two engines are interchangeable
and directly comparable.

Kept in its own module so iterating here never shifts the source locations
embedded in `d2q9_pallas`'s serialized Mosaic kernels (cache-key quirk, see
CLAUDE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import Params
from . import d2q9
from .d2q9_pallas import (LARGE_GRID_VMEM_BUDGET, MAX_STEPS_PER_PASS,
                          choose_band, choose_config)


def default_vmem_limit(band: int, nx: int, k_steps: int) -> int:
    """Right-sized scoped-VMEM budget: the 2-slot in/out/halo/mask buffers
    are explicit scratch here (unlike the auto pipeline's hidden double
    buffering), plus ~3 live (band+2K)-row temporaries for the K-step body,
    with 35% headroom."""
    slots = 2 * (9 * band * nx + 2 * 9 * 8 * nx      # f band + halo blocks
                 + band * nx + 2 * 8 * nx            # mask band + halos
                 + 9 * band * nx) * 4                # out band
    temps = 9 * (band + 2 * k_steps) * nx * 4 * 3
    return min(120 * 1024 * 1024, int((slots + temps) * 1.35))


def _kernel(scal_ref, f_hbm, mask_hbm, out_hbm, tot_ref,
            f_sl, p_sl, n_sl, m_sl, mp_sl, mn_sl, o_sl,
            f_sem, p_sem, n_sem, m_sem, mp_sem, mn_sem, o_sem,
            *, band: int, k_steps: int, omega: float, accel_w1: float,
            accel_w2: float, accel_row: int, mode: str = "full"):
    # mode is DIAGNOSTIC ONLY (experiments/d2q9-breakdown methodology):
    # 'stream_only' skips the BGK collision, 'copy' skips everything —
    # attributes kernel time between memory movement and arithmetic.
    """All bands of K fused timesteps, explicitly double-buffered.

    scal_ref carries (row_offset, valid_lo, valid_hi, global_ny, col_lo,
    col_hi) exactly as in d2q9_pallas._kernel.
    """
    ny = f_hbm.shape[1]
    w = f_hbm.shape[-1]
    nb = ny // band
    nblk8 = ny // 8
    bb8 = band // 8
    k = k_steps
    dt = jnp.float32 if f_hbm.dtype == jnp.bfloat16 else f_hbm.dtype

    row_offset = scal_ref[0, 0]
    valid_lo = scal_ref[0, 1]
    valid_hi = scal_ref[0, 2]
    global_ny = scal_ref[0, 3]
    col_lo = scal_ref[0, 4]
    col_hi = scal_ref[0, 5]

    def in_dmas(slot, bi):
        # band block + the two 8-row wraparound halo blocks (the same
        # periodic scheme as d2q9_pallas's BlockSpec index maps)
        prev8 = jax.lax.rem(bi * bb8 - 1 + nblk8, nblk8) * 8
        next8 = jax.lax.rem(bi * bb8 + bb8, nblk8) * 8
        row0 = bi * band
        return (
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(row0, band), :], f_sl.at[slot],
                f_sem.at[slot]),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(prev8, 8), :], p_sl.at[slot],
                p_sem.at[slot]),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(next8, 8), :], n_sl.at[slot],
                n_sem.at[slot]),
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(row0, band), :], m_sl.at[slot],
                m_sem.at[slot]),
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(prev8, 8), :], mp_sl.at[slot],
                mp_sem.at[slot]),
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(next8, 8), :], mn_sl.at[slot],
                mn_sem.at[slot]),
        )

    def out_dma(slot, bi):
        return pltpu.make_async_copy(
            o_sl.at[slot], out_hbm.at[:, pl.ds(bi * band, band), :],
            o_sem.at[slot])

    for j in range(k):  # SMEM accepts only scalar stores
        tot_ref[0, j] = jnp.zeros((), tot_ref.dtype)

    for dma in in_dmas(0, 0):
        dma.start()

    def east(x):
        return pltpu.roll(x, 1, axis=x.ndim - 1)

    def west(x):
        return pltpu.roll(x, w - 1, axis=x.ndim - 1)

    def streamed(ext, n_rows):
        def up(q):
            return ext[q, 0:n_rows, :]

        def down(q):
            return ext[q, 2:n_rows + 2, :]

        def mid(q):
            return ext[q, 1:n_rows + 1, :]

        return (
            mid(0), east(mid(1)), up(2), west(mid(3)), down(4),
            east(up(5)), west(up(6)), west(down(7)), east(down(8)),
        )

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def body(bi, _):
        slot = jax.lax.rem(bi, 2)
        nxt = jax.lax.rem(bi + 1, 2)

        @pl.when(bi + 1 < nb)
        def _():
            for dma in in_dmas(nxt, bi + 1):
                dma.start()

        for dma in in_dmas(slot, bi):
            dma.wait()

        if mode == "copy":
            @pl.when(bi >= 2)
            def _():
                out_dma(slot, bi - 2).wait()

            o_sl[slot] = f_sl[slot][...]
            tot_ref[0, 0] += jnp.sum(f_sl[slot][0, :1, :128].astype(dt))
            out_dma(slot, bi).start()
            return 0

        state = jnp.concatenate(
            [p_sl[slot][:, 8 - k:8, :], f_sl[slot], n_sl[slot][:, 0:k, :]],
            axis=1,
        ).astype(dt)
        if k > 1:
            mask_wide = jnp.concatenate(
                [mp_sl[slot][8 - (k - 1):8, :], m_sl[slot],
                 mn_sl[slot][0:k - 1, :]], axis=0)
        else:
            mask_wide = m_sl[slot][...]

        band_rows = bi * band + jax.lax.broadcasted_iota(
            jnp.int32, (band, 1), 0)
        valid_cells = ((band_rows >= valid_lo) & (band_rows < valid_hi)
                       & (cols >= col_lo) & (cols < col_hi))

        for j in range(1, k + 1):
            n_rows = band + 2 * (k - j)
            lo = (k - 1) - (k - j)
            mask_j = mask_wide[lo:lo + n_rows, :] != 0
            rows_j = (bi * band - (k - j) + row_offset) + \
                jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
            amask_j = (jnp.mod(rows_j, global_ny) == accel_row).astype(dt)
            if mode == "stream_only":
                state = jnp.stack(streamed(state, n_rows))
                u = state[0]
            else:
                state, u = d2q9.collide_fields(
                    streamed(state, n_rows), mask_j, amask_j,
                    omega=omega, accel_w1=accel_w1, accel_w2=accel_w2,
                )
            interior = u[k - j:k - j + band, :]
            tot_ref[0, j - 1] += jnp.sum(
                jnp.where(valid_cells, interior, jnp.zeros((), dt)))

        @pl.when(bi >= 2)
        def _():
            out_dma(slot, bi - 2).wait()

        o_sl[slot] = state.astype(o_sl.dtype)
        out_dma(slot, bi).start()
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out_dma((nb - 2) % 2, nb - 2).wait()
    out_dma((nb - 1) % 2, nb - 1).wait()


@functools.lru_cache(maxsize=64)
def _build_step(shape, dtype_name, band, k_steps, omega, accel_w1, accel_w2,
                accel_row, interpret, vmem_limit=None, mode="full"):
    ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if ny % band or band % 8:
        raise ValueError(f"band {band} must divide ny {ny} and be a multiple of 8")
    if ny // band < 2:
        raise ValueError("manual pipeline needs >= 2 bands "
                         "(its epilogue drains bands nb-2 and nb-1)")
    if not 1 <= k_steps <= MAX_STEPS_PER_PASS:
        raise ValueError(f"k_steps must be in 1..{MAX_STEPS_PER_PASS}")

    kernel = functools.partial(
        _kernel, band=band, k_steps=k_steps, omega=omega,
        accel_w1=accel_w1, accel_w2=accel_w2, accel_row=accel_row,
        mode=mode,
    )
    tot_dtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 6), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k_steps), lambda: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct((1, k_steps), tot_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 9, band, nx), dtype),   # f band
            pltpu.VMEM((2, 9, 8, nx), dtype),      # prev 8-row halo
            pltpu.VMEM((2, 9, 8, nx), dtype),      # next 8-row halo
            pltpu.VMEM((2, band, nx), dtype),      # mask band
            pltpu.VMEM((2, 8, nx), dtype),         # mask prev halo
            pltpu.VMEM((2, 8, nx), dtype),         # mask next halo
            pltpu.VMEM((2, 9, band, nx), dtype),   # out band
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or default_vmem_limit(band, nx,
                                                              k_steps),
        ),
        interpret=interpret,
    )


def stepk(
    f: jax.Array,
    mask_f: jax.Array,
    *,
    k_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    band: int | None = None,
    interpret: bool | None = None,
    row_offset: jax.Array | int = 0,
    valid_rows: tuple | None = None,
    valid_cols: tuple | None = None,
    global_ny: int | None = None,
    vmem_limit: int | None = None,
    mode: str = "full",
):
    """K fused timesteps in one explicitly pipelined HBM pass. Drop-in for
    `d2q9_pallas.stepk` (same contract, incl. the diagnostic `mode`)."""
    _, ny, nx = f.shape
    if band is None:
        # same K-keyed budget as d2q9_pallas.stepk (K>=6 amortises its halo
        # recompute only at ~double the K=4 band width)...
        band = choose_band(ny, nx, LARGE_GRID_VMEM_BUDGET) \
            if k_steps >= 6 else choose_band(ny, nx)
        if ny // band < 2:
            # ...then the largest divisor band with >= 2 bands in flight
            # (the explicit pipeline's epilogue drains two bands)
            band = max((b for b in range(8, band, 8)
                        if ny % b == 0 and ny // b >= 2), default=band)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if valid_rows is None:
        valid_rows = (0, ny)
    if valid_cols is None:
        valid_cols = (0, nx)
    call = _build_step(
        (ny, nx), jnp.dtype(f.dtype).name, band, int(k_steps), float(omega),
        float(accel_w1), float(accel_w2), int(accel_row), bool(interpret),
        None if vmem_limit is None else int(vmem_limit), str(mode),
    )
    scal = jnp.stack(
        [jnp.asarray(row_offset, jnp.int32),
         jnp.asarray(valid_rows[0], jnp.int32),
         jnp.asarray(valid_rows[1], jnp.int32),
         jnp.asarray(global_ny if global_ny is not None else ny, jnp.int32),
         jnp.asarray(valid_cols[0], jnp.int32),
         jnp.asarray(valid_cols[1], jnp.int32)]
    ).reshape(1, 6)
    f_new, tots = call(scal, f, mask_f)
    return f_new, tots[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "k_steps", "omega", "accel_w1", "accel_w2",
                     "accel_row", "band", "interpret", "vmem_limit"),
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
    k_steps: int = 1,
    band: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
):
    """`num_steps` timesteps under one lax.scan, `k_steps` per HBM pass —
    the manual-pipeline analogue of `d2q9_pallas.run`."""
    if num_steps % k_steps:
        raise ValueError(f"num_steps {num_steps} not a multiple of k_steps {k_steps}")

    def body(carry, _):
        f_new, tots = stepk(
            carry, mask_f, k_steps=k_steps, omega=omega, accel_w1=accel_w1,
            accel_w2=accel_w2, accel_row=accel_row, band=band,
            interpret=interpret, vmem_limit=vmem_limit,
        )
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)


def simulate(params: Params, f: jax.Array, obstacle_mask: jax.Array,
             k_steps: int | None = None, **kw):
    """Reference-semantics full simulation on the manual-pipeline engine.
    Same contract as d2q9_pallas.simulate."""
    aw = d2q9.AccelWeights.from_params(params)
    accel_row = params.ny - 2
    obstacle_mask = jnp.asarray(obstacle_mask)
    f = d2q9.first_accelerate(
        jnp.asarray(f), obstacle_mask, accel_row=accel_row,
        accel_w1=aw.w1, accel_w2=aw.w2,
    )
    mask_f = obstacle_mask.astype(f.dtype)
    if k_steps is None:
        preferred = choose_config(params.ny, params.nx)[1]
        k_steps = next(
            (kk for kk in (preferred, 4, 2, 1)
             if params.max_iters % kk == 0 and params.ny >= 16),
            1,
        )
    f_final, tot_u = run(
        f, mask_f, num_steps=params.max_iters, omega=params.omega,
        accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row,
        k_steps=k_steps, **kw,
    )
    num_free = jnp.asarray((~obstacle_mask).sum(), dtype=f.dtype)
    return f_final, tot_u / num_free
