"""In-place (aliased) variant of the explicitly pipelined K-step D2Q9 kernel.

Same maths, band decomposition and kernel contract as `d2q9_pallas_manual`
(itself the explicit-DMA twin of `d2q9_pallas`, the TPU analogue of the
reference's `LbmTimeStepVertex`, main/codelets/D2Q9Codelets.cpp:94-191), but
the K-step-advanced bands are written back INTO the input lattice
(`input_output_aliases`) instead of a second ping-pong array.

Why it exists: experiments/d2q9-overlap measured the two-stream pattern
(separate in/out arrays) as the cap on the non-resident copy floor —
~320 GB/s combined for every Pallas pipeline shape, depth and descriptor
layout, while the same traffic aliased in place runs at ~613 GB/s (and
XLA's own donated-carry fused loop at ~625). Aliasing alone nearly halves
the kernel's exposed HBM time.

Correctness under in-place writes needs two orderings the ping-pong engines
don't:

* write-after-read: band bi-1's write-back starts only AFTER band bi's
  fetch completed (band bi's K-row top halo reads band bi-1's rows). The
  probe's `manual_alias_safe` engine measured this delayed write-back at
  the full aliased floor (611.8 GB/s).
* wraparound snapshot: the LAST band's bottom halo wraps to rows [0, 8),
  which band 0's write-back has long overwritten — a prologue DMA
  snapshots those rows into VMEM before any write, and band nb-1's halo
  is served from the snapshot.

The periodic mask is never written, so its halo DMAs stay modular.

Kept in its own module so iterating here never shifts the source locations
embedded in the other engines' serialized Mosaic kernels (cache-key quirk,
see CLAUDE.md).
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
                          RESIDENT_STATE_CELLS, choose_band)


def choose_config(h: int, w: int) -> tuple[int, int]:
    """(band, k_steps) optimum for the IN-PLACE engine, from the measured
    v5e sweep (experiments/d2q9-overlap/results.csv, 2026-08). In-place
    aliasing halves the HBM traffic AND overlaps compute under the copy
    far better than the two-stream engines, so shallow temporal blocking
    wins: the halo-recompute cost of deep K is no longer buying exposed-
    copy reduction. Measured: 1024^2 (128,4) 12,114 MLUPS; 2048^2 (128,2)
    14,238 (K4 14,115, K8 13,928); 4096^2 (64,2) 15,186 (K4 14,811, K8
    14,535); 8192^2 (32,4) 14,369 (K2 13,967, K8 12,971). K=3 always
    loses (odd K wastes the 8-row halo-block granularity). Narrow bands
    (< 64) keep K=4."""
    if h * w <= RESIDENT_STATE_CELLS:
        return choose_band(h, w), 4
    band = choose_band(h, w, LARGE_GRID_VMEM_BUDGET)
    return band, (2 if band >= 64 else 4)


def default_vmem_limit(band: int, nx: int, k_steps: int) -> int:
    """Right-sized scoped-VMEM budget: the manual engine's 2-slot buffers
    plus the (9, 8, nx) wraparound snapshot."""
    slots = 2 * (9 * band * nx + 2 * 9 * 8 * nx      # f band + halo blocks
                 + band * nx + 2 * 8 * nx            # mask band + halos
                 + 9 * band * nx) * 4                # out band
    snap = 9 * 8 * nx * 4
    temps = 9 * (band + 2 * k_steps) * nx * 4 * 3
    return min(120 * 1024 * 1024, int((slots + snap + temps) * 1.35))


def _kernel(scal_ref, f_hbm, mask_hbm, out_hbm, tot_ref,
            f_sl, p_sl, n_sl, m_sl, mp_sl, mn_sl, o_sl, wrap_sl,
            f_sem, p_sem, n_sem, m_sem, mp_sem, mn_sem, o_sem, wrap_sem,
            *, band: int, k_steps: int, omega: float, accel_w1: float,
            accel_w2: float, accel_row: int, all_valid: bool = False,
            mode: str = "full"):
    """All bands of K fused timesteps, explicitly pipelined, written back
    in place (out_hbm aliases f_hbm).

    scal_ref carries (row_offset, valid_lo, valid_hi, global_ny, col_lo,
    col_hi) exactly as in d2q9_pallas._kernel. mode is DIAGNOSTIC ONLY
    ('stream_only' skips the BGK collision, 'copy' skips everything).

    Round-4 band-specialization attempt (VERDICT #1), MEASURED NEGATIVE
    and reverted: routing accel-free bands onto a body-force-free fast
    path via per-band SMEM flags + pl.when cost ~32% at 1024^2 (12,075 ->
    8,275/8,110 MLUPS with the flags on/off — the SAME compiled kernel,
    so the dual-branch kernel STRUCTURE is the cost: ~2x unrolled code in
    the fori_loop body defeats Mosaic's pipelining long before the ~5%
    op-count ceiling of the skipped force adds could pay). Evidence:
    experiments/d2q9-overlap/regress_probe.csv. The obstacle half of the
    idea is inapplicable by data inspection: EVERY shipped reference mask
    has box walls on all four sides (plus a vertical line at 1024^2), so
    no row band is ever obstacle-free. Both halves stay unconditional.
    all_valid=True (static) is the kept piece: it drops the
    ghost-exclusion `where` from the Sum|u| reduction — exact when the
    caller's valid window is the whole grid, the single-chip case."""
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

    def f_dmas(slot, bi):
        # band block + the 8-row prev halo (modular). The NEXT halo is
        # handled by next_dma/snapshot below: for band nb-1 it wraps onto
        # rows band 0 has already overwritten in place.
        prev8 = jax.lax.rem(bi * bb8 - 1 + nblk8, nblk8) * 8
        row0 = bi * band
        return (
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(row0, band), :], f_sl.at[slot],
                f_sem.at[slot]),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(prev8, 8), :], p_sl.at[slot],
                p_sem.at[slot]),
        )

    def next_dma(slot, bi):
        next8 = jax.lax.rem(bi * bb8 + bb8, nblk8) * 8
        return pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(next8, 8), :], n_sl.at[slot], n_sem.at[slot])

    def mask_dmas(slot, bi):
        # the mask is never written: modular halos stay safe everywhere
        prev8 = jax.lax.rem(bi * bb8 - 1 + nblk8, nblk8) * 8
        next8 = jax.lax.rem(bi * bb8 + bb8, nblk8) * 8
        row0 = bi * band
        return (
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

    def start_in(slot, bi):
        for dma in f_dmas(slot, bi) + mask_dmas(slot, bi):
            dma.start()

        @pl.when(bi != nb - 1)
        def _():
            next_dma(slot, bi).start()

    def wait_in(slot, bi):
        for dma in f_dmas(slot, bi) + mask_dmas(slot, bi):
            dma.wait()

        @pl.when(bi != nb - 1)
        def _():
            next_dma(slot, bi).wait()

        @pl.when(bi == nb - 1)
        def _():
            # wraparound: rows [0, 8) as they were BEFORE band 0's
            # in-place write — from the prologue snapshot
            n_sl[slot] = wrap_sl[...]

    def out_dma(slot, bi):
        return pltpu.make_async_copy(
            o_sl.at[slot], out_hbm.at[:, pl.ds(bi * band, band), :],
            o_sem.at[slot])

    for j in range(k):  # SMEM accepts only scalar stores
        tot_ref[0, j] = jnp.zeros((), tot_ref.dtype)

    # prologue: snapshot the wrap rows before ANY in-place write, then
    # start band 0's fetch
    wrap_dma = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(0, 8), :], wrap_sl, wrap_sem)
    wrap_dma.start()
    start_in(0, 0)
    wrap_dma.wait()

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

    cols = None if all_valid else jax.lax.broadcasted_iota(
        jnp.int32, (1, w), 1)

    def body(bi, _):
        slot = jax.lax.rem(bi, 2)
        nxt = jax.lax.rem(bi + 1, 2)

        @pl.when(bi + 1 < nb)
        def _():
            start_in(nxt, bi + 1)

        wait_in(slot, bi)

        # in(bi) done => every reader of band bi-1's rows has its data
        # (band bi's top halo was the last one) => its in-place
        # write-back is safe to start now
        @pl.when(bi >= 1)
        def _():
            out_dma(nxt, bi - 1).start()

        # free this iteration's o_sl slot (band bi-2 used the same one)
        @pl.when(bi >= 2)
        def _():
            out_dma(slot, bi - 2).wait()

        if mode == "copy":
            o_sl[slot] = f_sl[slot][...]
            tot_ref[0, 0] += jnp.sum(f_sl[slot][0, :1, :128].astype(dt))
            return 0

        state0 = jnp.concatenate(
            [p_sl[slot][:, 8 - k:8, :], f_sl[slot], n_sl[slot][:, 0:k, :]],
            axis=1,
        ).astype(dt)
        if k > 1:
            mask_wide = jnp.concatenate(
                [mp_sl[slot][8 - (k - 1):8, :], m_sl[slot],
                 mn_sl[slot][0:k - 1, :]], axis=0)
        else:
            mask_wide = m_sl[slot][...]
        maskb_wide = mask_wide

        if all_valid:
            valid_cells = None
        else:
            band_rows = bi * band + jax.lax.broadcasted_iota(
                jnp.int32, (band, 1), 0)
            valid_cells = ((band_rows >= valid_lo) & (band_rows < valid_hi)
                           & (cols >= col_lo) & (cols < col_hi))

        state = state0
        for j in range(1, k + 1):
            n_rows = band + 2 * (k - j)
            lo = (k - 1) - (k - j)
            mask_j = maskb_wide[lo:lo + n_rows, :] != 0
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
            if all_valid:
                tot_ref[0, j - 1] += jnp.sum(interior)
            else:
                tot_ref[0, j - 1] += jnp.sum(
                    jnp.where(valid_cells, interior, jnp.zeros((), dt)))
        o_sl[slot] = state.astype(o_sl.dtype)

        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out_dma((nb - 1) % 2, nb - 1).start()
    out_dma((nb - 2) % 2, nb - 2).wait()
    out_dma((nb - 1) % 2, nb - 1).wait()


@functools.lru_cache(maxsize=64)
def _build_step(shape, dtype_name, band, k_steps, omega, accel_w1, accel_w2,
                accel_row, interpret, vmem_limit=None, mode="full",
                all_valid=False):
    ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if ny % band or band % 8:
        raise ValueError(f"band {band} must divide ny {ny} and be a multiple of 8")
    if ny // band < 2:
        raise ValueError("in-place pipeline needs >= 2 bands "
                         "(its epilogue drains bands nb-2 and nb-1)")
    if k_steps > 8:
        raise ValueError("in-place pipeline supports k_steps <= 8 (halo "
                         "depth must fit the 8-row wraparound snapshot)")
    if not 1 <= k_steps <= MAX_STEPS_PER_PASS:
        raise ValueError(f"k_steps must be in 1..{MAX_STEPS_PER_PASS}")

    kernel = functools.partial(
        _kernel, band=band, k_steps=k_steps, omega=omega,
        accel_w1=accel_w1, accel_w2=accel_w2, accel_row=accel_row,
        all_valid=all_valid, mode=mode,
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
        # the whole point: the K-step-advanced lattice lands in the input
        # buffer (one HBM stream instead of two)
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 9, band, nx), dtype),   # f band
            pltpu.VMEM((2, 9, 8, nx), dtype),      # prev 8-row halo
            pltpu.VMEM((2, 9, 8, nx), dtype),      # next 8-row halo
            pltpu.VMEM((2, band, nx), dtype),      # mask band
            pltpu.VMEM((2, 8, nx), dtype),         # mask prev halo
            pltpu.VMEM((2, 8, nx), dtype),         # mask next halo
            pltpu.VMEM((2, 9, band, nx), dtype),   # out band
            pltpu.VMEM((9, 8, nx), dtype),         # wraparound snapshot
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
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
    """K fused timesteps in one in-place HBM pass. Drop-in for
    `d2q9_pallas.stepk` / `d2q9_pallas_manual.stepk` (same contract)."""
    _, ny, nx = f.shape
    if band is None:
        # the in-place optimum rides the wider large-grid band at EVERY
        # K on non-resident grids (choose_config's measured table)
        band = (choose_band(ny, nx) if ny * nx <= RESIDENT_STATE_CELLS
                else choose_band(ny, nx, LARGE_GRID_VMEM_BUDGET))
        if ny // band < 2:
            band = max((b for b in range(8, band, 8)
                        if ny % b == 0 and ny // b >= 2), default=band)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if valid_rows is None:
        valid_rows = (0, ny)
    if valid_cols is None:
        valid_cols = (0, nx)

    def _static_eq(x, v):
        import numpy as _np

        return isinstance(x, (int, _np.integer)) and int(x) == v

    # static single-chip case: the whole grid is valid -> the kernel can
    # drop the ghost-exclusion `where` from the reduction (bit-identical)
    all_valid = (_static_eq(row_offset, 0)
                 and _static_eq(valid_rows[0], 0)
                 and _static_eq(valid_rows[1], ny)
                 and _static_eq(valid_cols[0], 0)
                 and _static_eq(valid_cols[1], nx)
                 and (global_ny is None or _static_eq(global_ny, ny)))
    call = _build_step(
        (ny, nx), jnp.dtype(f.dtype).name, band, int(k_steps), float(omega),
        float(accel_w1), float(accel_w2), int(accel_row), bool(interpret),
        None if vmem_limit is None else int(vmem_limit), str(mode),
        all_valid,
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
    """`num_steps` timesteps under one lax.scan, `k_steps` per in-place
    HBM pass. The scan carry is updated in place (XLA reuses the while
    body's buffer, so only the initial carry costs a copy)."""
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
    """Reference-semantics full simulation on the in-place engine. Same
    contract as d2q9_pallas.simulate."""
    if params.ny % 8 or params.ny < 16:
        raise ValueError(
            f"the in-place engine needs ny to be a multiple of 8 with at "
            f"least 2 bands (ny >= 16); got ny={params.ny} — use "
            "engine='pallas' (any multiple-of-8 ny) or 'jax' "
            "(d2q9_pallas.choose_engine routes these automatically)")
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
             if params.max_iters % kk == 0),
            1,
        )
    f_final, tot_u = run(
        f, mask_f, num_steps=params.max_iters, omega=params.omega,
        accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row,
        k_steps=k_steps, **kw,
    )
    num_free = jnp.asarray((~obstacle_mask).sum(), dtype=f.dtype)
    return f_final, tot_u / num_free
