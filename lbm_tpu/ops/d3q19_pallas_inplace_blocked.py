"""In-place (aliased) explicitly pipelined (z, y)-blocked D3Q19 kernel.

The blocked counterpart of `d3q19_pallas_inplace`: for grids whose
(ny, nx) planes are too large for the z-slab working set (256x256-plane
shapes — 19 x 5 MB f32 planes exceed VMEM at any bz >= k, measured in
experiments/lbm3d-perf/sizes.csv), the automatic fallback is the
two-stream (z, y)-blocked kernel of d3q19_pallas at ~3.0-3.1k MLUPS.
This module moves the SAME blocked traffic as one aliased HBM stream
(`input_output_aliases`), the mechanism that lifted the slab kernel
+61% (experiments/lbm3d-perf/inplace.csv: the aliased kernel is at the
DMA floor of a ~400 GB/s one-stream pattern, math free).

Memory layout: Mosaic's `memref_slice` cannot take a DYNAMIC offset on
a tiled (sublane/lane) dim of an HBM ref, so the kernel views the
(19, nz, ny, nx) lattice as (19, nz, nby, by, nx) — y-block selection
becomes an integer index on an untiled dim, and the 8-row y-halo reads
are STATIC slices (`by-8:by` / `0:8`) of the neighbouring block. The
reshape is free (contiguous view) and `input_output_aliases` still
aliases the same buffer.

State assembly is DMA-direct: all nine input regions (center, z-halos,
8-row y-halo blocks, corners) land in ONE extended VMEM buffer at their
static offsets, so the compute body reads a contiguous
(19, bz+2K, by+2K, nx) slice with no `jnp.concatenate` assembly copies.
(Measured outcome: perf-neutral within the ±1% run-to-run variance —
4,417 concat-assembled vs 4,484/4,432 DMA-direct at 32x256x256/K=3,
against a 5,820-equivalent copy floor. The three-mode diagnostic
attributes the whole ~24% copy-vs-full gap to the BGK collision maths:
copy 5,820 == stream_only 5,818 vs full 4,432 — streaming slices and
x-rolls are free, and the slab kernel hides the same arithmetic under
its ~400 GB/s DMAs while this geometry's VPU throughput on ~70-row
sub-blocks cannot keep up even with the slower 295 GB/s stream. Jointly
DMA+VPU-bound; structural. This rewrite is kept because it is strictly
simpler and never slower. The extended buffer's VMEM footprint is
algebraically identical to the nine separate buffers', so the
calibrated (bz, by) tables carry over unchanged.)

In-place ordering is row-granular: a z-row of blocks (all iy of one iz)
is buffered in a 2-row VMEM block ring and flushed back into the input
lattice only after EVERY block of row iz+1 has fetched (row iz+1's
z-prev halos and y-wrapped corners are the last readers of row iz's
pre-step data). The z-wraparound (row nbz-1 reads planes [0, k) that
row 0's flush already overwrote) is served from a prologue VMEM
snapshot via local copies. The obstacle mask is never written, so its
halo DMAs stay modular everywhere.

Same maths as d3q19_pallas._blocked_kernel (reference citations there);
kept in its own module so iterating here never shifts the source
locations embedded in the other engines' serialized Mosaic kernels
(CLAUDE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import d3q19
from .d3q19_pallas import MAX_K


def estimate_vmem(bz: int, by: int, ny: int, nx: int, k: int) -> int:
    """Live-set estimate for the blocked in-place kernel (bytes)."""
    # 2-slot input buffers: f center/halos/corners + mask equivalents
    blk = (bz * by + 2 * k * by + 2 * bz * 8 + 4 * k * 8) * nx * 4
    ins = 2 * (19 * blk + blk)
    o_ring = 2 * 19 * bz * ny * nx * 4
    wrap = 19 * k * ny * nx * 4
    temps = 19 * (bz + 2 * k) * (by + 2 * k) * nx * 4 * 3
    return ins + o_ring + wrap + temps


def default_vmem_limit(bz: int, by: int, ny: int, nx: int, k: int) -> int:
    return min(120 * 1024 * 1024,
               int(estimate_vmem(bz, by, ny, nx, k) * 1.25))


def choose_config(nz: int, ny: int, nx: int, k_steps: int = 2,
                  budget: int = 130 * 1024 * 1024) -> tuple[int, int]:
    """(bz, by) for `run` on shapes beyond the slab kernel's VMEM. Prefers
    the largest y-block (fewest DMA issues) at bz=4, degrading bz before
    by (the output ring scales with bz x ny). Budget calibrated on
    TPU-measured compiles at 256x256 planes: by=64/k=3 (est ~122 MB)
    compiles and is the measured best (4,417 in inplace.csv; probe
    sweep: by=64 4,436 vs by=32 3,870 at K=3, by=64 4,128 vs by=32
    3,845 at K=2); by=128/k=2 (est ~158 MB) is past the 128 MB VMEM."""
    k = k_steps
    for bz in (4, 2, 1):
        if nz % bz or k > bz or nz // bz < 2:
            continue
        legal = [b for b in range(8, min(ny, 256) + 1, 8) if ny % b == 0]
        for by in sorted(legal, reverse=True):
            if estimate_vmem(bz, by, ny, nx, k) <= budget:
                return bz, by
    raise ValueError(
        f"no (bz, by) fits the {budget >> 20} MB VMEM budget for "
        f"{nz}x{ny}x{nx} at k={k} — pad ny or use the jax engine")


def pick_engine(nz: int, ny: int, nx: int, k_steps: int = 2
                ) -> tuple[str, int, int | None]:
    """('slab'|'blocked', bz, by) for the in-place engine family: the
    z-slab kernel where its working set fits (it is faster — one big
    stream), the blocked kernel beyond. Mirrors d3q19_pallas.choose_config
    but for the aliased kernels."""
    k = k_steps
    bz = max(k, 4)
    while nz % bz:
        bz //= 2
    bz = max(bz, k) if nz % k == 0 else bz
    # raw (un-inflated, un-clipped) slab live-set estimate, calibrated on
    # TPU-measured compiles at 128x256 planes: k=2 est ~127 MB and k=3
    # ~154 compile; k=4 ~182 and 256x256-plane k=2 ~253 exceed VMEM
    plane = ny * nx * 4
    slab_est = (2 * (19 * bz + 2 * 19 * k + bz + 2 * k + 19 * bz) * plane
                + 19 * k * plane + 19 * (bz + 2 * k) * plane * 3)
    if (nz // max(bz, 1) >= 2 and bz >= k
            and slab_est <= 165 * 1024 * 1024):
        return "slab", bz, None
    bz, by = choose_config(nz, ny, nx, k)
    return "blocked", bz, by


def choose_k(nz: int, ny: int, nx: int, num_steps: int, max_k: int = 3
             ) -> tuple[str, int, int | None, int]:
    """('slab'|'blocked', bz, by, k): deepest TPU-validated K (<= max_k)
    dividing num_steps with a feasible in-place config. K=3 is the
    measured production depth (slab 6,386 vs 5,131 MLUPS at K=2 at the
    bench shape; blocked 4,417 at 32x256x256 vs 4,128 probed at K=2 —
    inplace.csv); K=4 fails to compile on both kernels (VMEM)."""
    for k in range(min(max_k, 3), 0, -1):
        if num_steps % k:
            continue
        try:
            kind, bz, by = pick_engine(nz, ny, nx, k)
        except ValueError:
            continue
        return kind, bz, by, k
    raise ValueError(
        f"no in-place config fits {nz}x{ny}x{nx} at any K <= {max_k} "
        f"dividing {num_steps} steps — pad the grid or use the jax engine")


def _kernel(scal_ref, f_hbm, mask_hbm, out_hbm, tot_ref,
            ext_f, ext_m,
            o_ring, wrap_sl,
            f_sem, m_sem, o_sem, wrap_sem,
            *, bz: int, by: int, k_steps: int, omega: float,
            density: float, accel: float, accel_plane: int,
            mode: str = "full", all_valid: bool = False):
    """All (z, y)-blocks of K fused timesteps, explicitly pipelined,
    written back in place row-by-row. f_hbm/out_hbm are the 5-D
    (19, nz, nby, by, nx) views; scal_ref carries
    (global_nz, plane_off, valid_lo, valid_hi, row_lo, row_hi) exactly as
    in d3q19_pallas._kernel (the y-row window excludes ghost ROWS of a
    (z, y)-sharded block from the Sum|u|; all_valid=True drops the
    exclusion — the single-chip case); mode is DIAGNOSTIC ONLY."""
    nz = f_hbm.shape[1]
    nby = f_hbm.shape[2]
    nx = f_hbm.shape[4]
    nbz = nz // bz
    nb = nbz * nby
    k = k_steps
    dt = jnp.float32 if f_hbm.dtype == jnp.bfloat16 else f_hbm.dtype

    global_nz = scal_ref[0, 0]
    plane_off = scal_ref[0, 1]
    valid_lo = scal_ref[0, 2]
    valid_hi = scal_ref[0, 3]
    row_lo = scal_ref[0, 4]
    row_hi = scal_ref[0, 5]

    def _idx(j):
        iz = jax.lax.div(j, nby)
        iy = jax.lax.rem(j, nby)
        return (iz, iy, iz * bz,                       # z0
                jax.lax.rem(iz * bz - k + nz, nz),     # zp0
                jax.lax.rem(iz * bz + bz, nz),         # zn0 (0 on last row)
                jax.lax.rem(iy - 1 + nby, nby),        # y-prev block
                jax.lax.rem(iy + 1, nby))              # y-next block

    # Extended-buffer geometry: ext_f[slot] is (19, bz+2k, 16+by, nx) —
    # z rows [0,k)=z-prev | [k,k+bz)=center | [k+bz,k+2k+bz)... i.e.
    # [k+bz, bz+2k)=z-next; y rows [0,8)=y-prev 8-row halo block |
    # [8, 8+by)=center | [8+by, 16+by)=y-next. Every input DMA lands at
    # its static offset, so compute reads one contiguous slice and there
    # is no in-VMEM concat assembly. The union of the nine regions tiles
    # the buffer exactly — no cell is left stale between iterations.
    ZC, ZN = k, k + bz          # z offsets of center / z-next regions
    YC, YN = 8, 8 + by          # y offsets of center / y-next regions

    def _f_always(slot, j):
        _, iy, z0, zp0, _, jbp, jbn = _idx(j)
        A = pltpu.make_async_copy
        return (
            A(f_hbm.at[:, pl.ds(z0, bz), iy],
              ext_f.at[slot, :, ZC:ZN, YC:YN], f_sem.at[slot, 0]),
            A(f_hbm.at[:, pl.ds(zp0, k), iy],
              ext_f.at[slot, :, 0:ZC, YC:YN], f_sem.at[slot, 1]),
            A(f_hbm.at[:, pl.ds(z0, bz), jbp, pl.ds(by - 8, 8)],
              ext_f.at[slot, :, ZC:ZN, 0:YC], f_sem.at[slot, 3]),
            A(f_hbm.at[:, pl.ds(z0, bz), jbn, pl.ds(0, 8)],
              ext_f.at[slot, :, ZC:ZN, YN:], f_sem.at[slot, 4]),
            A(f_hbm.at[:, pl.ds(zp0, k), jbp, pl.ds(by - 8, 8)],
              ext_f.at[slot, :, 0:ZC, 0:YC], f_sem.at[slot, 5]),
            A(f_hbm.at[:, pl.ds(zp0, k), jbn, pl.ds(0, 8)],
              ext_f.at[slot, :, 0:ZC, YN:], f_sem.at[slot, 6]),
        )

    def _f_znext_hbm(slot, j):
        _, iy, _, _, zn0, jbp, jbn = _idx(j)
        A = pltpu.make_async_copy
        return (
            A(f_hbm.at[:, pl.ds(zn0, k), iy],
              ext_f.at[slot, :, ZN:, YC:YN], f_sem.at[slot, 2]),
            A(f_hbm.at[:, pl.ds(zn0, k), jbp, pl.ds(by - 8, 8)],
              ext_f.at[slot, :, ZN:, 0:YC], f_sem.at[slot, 7]),
            A(f_hbm.at[:, pl.ds(zn0, k), jbn, pl.ds(0, 8)],
              ext_f.at[slot, :, ZN:, YN:], f_sem.at[slot, 8]),
        )

    def _f_znext_wrap(slot, j):
        # last z-row: planes [0, k) as they were BEFORE row 0's in-place
        # flush — local copies out of the prologue snapshot (same byte
        # counts as the HBM fetches, signalling the same semaphores)
        _, iy, _, _, _, jbp, jbn = _idx(j)
        A = pltpu.make_async_copy
        return (
            A(wrap_sl.at[:, :, iy],
              ext_f.at[slot, :, ZN:, YC:YN], f_sem.at[slot, 2]),
            A(wrap_sl.at[:, :, jbp, pl.ds(by - 8, 8)],
              ext_f.at[slot, :, ZN:, 0:YC], f_sem.at[slot, 7]),
            A(wrap_sl.at[:, :, jbn, pl.ds(0, 8)],
              ext_f.at[slot, :, ZN:, YN:], f_sem.at[slot, 8]),
        )

    def _m_dmas(slot, j):
        # the mask is never written: modular halos stay safe everywhere
        _, iy, z0, zp0, zn0, jbp, jbn = _idx(j)
        A = pltpu.make_async_copy
        return (
            A(mask_hbm.at[pl.ds(z0, bz), iy],
              ext_m.at[slot, ZC:ZN, YC:YN], m_sem.at[slot, 0]),
            A(mask_hbm.at[pl.ds(zp0, k), iy],
              ext_m.at[slot, 0:ZC, YC:YN], m_sem.at[slot, 1]),
            A(mask_hbm.at[pl.ds(zn0, k), iy],
              ext_m.at[slot, ZN:, YC:YN], m_sem.at[slot, 2]),
            A(mask_hbm.at[pl.ds(z0, bz), jbp, pl.ds(by - 8, 8)],
              ext_m.at[slot, ZC:ZN, 0:YC], m_sem.at[slot, 3]),
            A(mask_hbm.at[pl.ds(z0, bz), jbn, pl.ds(0, 8)],
              ext_m.at[slot, ZC:ZN, YN:], m_sem.at[slot, 4]),
            A(mask_hbm.at[pl.ds(zp0, k), jbp, pl.ds(by - 8, 8)],
              ext_m.at[slot, 0:ZC, 0:YC], m_sem.at[slot, 5]),
            A(mask_hbm.at[pl.ds(zp0, k), jbn, pl.ds(0, 8)],
              ext_m.at[slot, 0:ZC, YN:], m_sem.at[slot, 6]),
            A(mask_hbm.at[pl.ds(zn0, k), jbp, pl.ds(by - 8, 8)],
              ext_m.at[slot, ZN:, 0:YC], m_sem.at[slot, 7]),
            A(mask_hbm.at[pl.ds(zn0, k), jbn, pl.ds(0, 8)],
              ext_m.at[slot, ZN:, YN:], m_sem.at[slot, 8]),
        )

    def start_in(slot, j):
        for dma in _f_always(slot, j) + _m_dmas(slot, j):
            dma.start()
        last_row = _idx(j)[0] == nbz - 1

        @pl.when(jnp.logical_not(last_row))
        def _():
            for dma in _f_znext_hbm(slot, j):
                dma.start()

        @pl.when(last_row)
        def _():
            for dma in _f_znext_wrap(slot, j):
                dma.start()

    def wait_in(slot, j):
        for dma in _f_always(slot, j) + _m_dmas(slot, j):
            dma.wait()
        last_row = _idx(j)[0] == nbz - 1

        @pl.when(jnp.logical_not(last_row))
        def _():
            for dma in _f_znext_hbm(slot, j):
                dma.wait()

        @pl.when(last_row)
        def _():
            for dma in _f_znext_wrap(slot, j):
                dma.wait()

    def out_dma(izb, iy_out):
        # ring slot for block (izb, iy_out); iy_out is a static Python int
        s = jax.lax.rem(izb, 2) * nby + iy_out
        return pltpu.make_async_copy(
            o_ring.at[s],
            out_hbm.at[:, pl.ds(izb * bz, bz), iy_out],
            o_sem.at[s])

    for j in range(k):  # SMEM accepts only scalar stores
        tot_ref[0, j] = jnp.zeros((), tot_ref.dtype)

    wrap_dma = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(0, k)], wrap_sl, wrap_sem)
    wrap_dma.start()
    start_in(0, 0)
    wrap_dma.wait()

    def roll_x(x, d):
        return pltpu.roll(x, d % nx, axis=x.ndim - 1)

    def streamed(ext, n_z, n_y):
        out = []
        for q in range(d3q19.NUM_SPEEDS):
            dz, dy, dx = (int(v) for v in d3q19.E[q])
            x = ext[q, 1 - dz: 1 - dz + n_z, 1 - dy: 1 - dy + n_y, :]
            if dx:
                x = roll_x(x, dx)
            out.append(x)
        return out

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)
        iz, iy = _idx(j)[0], _idx(j)[1]
        out_slot = jax.lax.rem(iz, 2) * nby + iy

        @pl.when(j + 1 < nb)
        def _():
            start_in(nxt, j + 1)

        wait_in(slot, j)

        # in(row iz) complete for its LAST block => every reader of row
        # iz-1's pre-step data (row iz's z-prev halos and y-wrapped
        # corners) has its copy => row iz-1's in-place flush is safe
        @pl.when(jnp.logical_and(iy == nby - 1, iz >= 1))
        def _():
            for iy_out in range(nby):
                out_dma(iz - 1, iy_out).start()

        # the ring half about to be written was last flushed for row
        # iz-2: drain it before overwriting
        @pl.when(jnp.logical_and(iy == 0, iz >= 2))
        def _():
            for iy_out in range(nby):
                out_dma(iz - 2, iy_out).wait()

        if mode == "copy":
            o_ring[out_slot] = ext_f[slot, :, ZC:ZN, YC:YN, :]
            tot_ref[0, 0] += jnp.sum(
                ext_f[slot, 0, ZC:ZC + 1, YC:YC + 1, :1].astype(dt))
            return 0

        # one contiguous slice of the DMA-assembled extended buffer —
        # (19, bz+2k, by+2k, nx), no concat copies
        state = ext_f[slot, :, :, YC - k: YN + k, :].astype(dt)
        # mask needs one fewer halo ring (sub-step jj consumes width k-jj)
        mask_wide = ext_m[slot, 1: ZN + k - 1,
                          YC - (k - 1): YN + (k - 1), :]

        for jj in range(1, k + 1):
            n_z = bz + 2 * (k - jj)
            n_y = by + 2 * (k - jj)
            lo = (k - 1) - (k - jj)
            mask_j = mask_wide[lo: lo + n_z, lo: lo + n_y, :] != 0
            planes_j = (iz * bz - (k - jj) + plane_off) + \
                jax.lax.broadcasted_iota(jnp.int32, (n_z, 1, 1), 0)
            amask_j = (jnp.mod(planes_j, global_nz) == accel_plane
                       ).astype(dt)
            if mode == "stream_only":
                # streaming slices + x-rolls without the BGK maths:
                # attributes the copy-vs-full gap between the sub-slice
                # realignment and the collision arithmetic
                state = jnp.stack(streamed(state, n_z, n_y))
                u = state[0]
            else:
                state, u = d3q19.collide_fields(
                    streamed(state, n_z, n_y), mask_j, amask_j,
                    omega=omega, density=density, accel=accel)
            interior = u[k - jj: k - jj + bz, k - jj: k - jj + by]
            if all_valid:
                tot_ref[0, jj - 1] += jnp.sum(interior)
            else:
                band_planes = iz * bz + jax.lax.broadcasted_iota(
                    jnp.int32, (bz, 1, 1), 0)
                rows = iy * by + jax.lax.broadcasted_iota(
                    jnp.int32, (1, by, 1), 1)
                valid = ((band_planes >= valid_lo)
                         & (band_planes < valid_hi)
                         & (rows >= row_lo) & (rows < row_hi))
                tot_ref[0, jj - 1] += jnp.sum(
                    jnp.where(valid, interior, jnp.zeros((), dt)))

        o_ring[out_slot] = state.astype(o_ring.dtype)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    for iy_out in range(nby):
        out_dma(nbz - 1, iy_out).start()
    for iy_out in range(nby):
        out_dma(nbz - 2, iy_out).wait()
    for iy_out in range(nby):
        out_dma(nbz - 1, iy_out).wait()


@functools.lru_cache(maxsize=32)
def _build_step(shape, dtype_name, bz, by, k_steps, omega, density, accel,
                accel_plane, interpret, vmem_limit=None, mode="full",
                all_valid=False):
    nz, ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if nz % bz or ny % by or by % 8:
        raise ValueError(f"bz {bz} must divide nz {nz}; by {by} must "
                         f"divide ny {ny} and be a multiple of 8")
    if nz // bz < 2:
        raise ValueError("in-place pipeline needs >= 2 z-rows "
                         "(its epilogue drains rows nbz-2 and nbz-1)")
    if not 1 <= k_steps <= MAX_K:
        raise ValueError(f"k_steps must be in 1..{MAX_K}")
    if k_steps > bz:
        raise ValueError("k_steps must not exceed bz (the K-plane z-halo "
                         "must fit within one neighbouring row)")
    if k_steps > 8:
        raise ValueError("k_steps must not exceed the 8-row y-halo blocks")
    k = k_steps
    nby = ny // by

    kernel = functools.partial(
        _kernel, bz=bz, by=by, k_steps=k, omega=omega, density=density,
        accel=accel, accel_plane=accel_plane, mode=mode,
        all_valid=all_valid,
    )

    def V(c, z, y):
        return pltpu.VMEM((2, c, z, y, nx), dtype)

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 6), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k), lambda: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((19, nz, nby, by, nx), dtype),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        input_output_aliases={1: 0},
        scratch_shapes=[
            # DMA-assembled extended input (double-buffered): z-prev |
            # center | z-next rows x 8-row y-halo | center | y-halo cols
            V(19, bz + 2 * k, 16 + by),               # ext_f
            pltpu.VMEM((2, bz + 2 * k, 16 + by, nx), dtype),  # ext_m
            pltpu.VMEM((2 * nby, 19, bz, by, nx), dtype),  # out block ring
            pltpu.VMEM((19, k, nby, by, nx), dtype),  # wraparound snapshot
            pltpu.SemaphoreType.DMA((2, 9)),          # f in
            pltpu.SemaphoreType.DMA((2, 9)),          # mask in
            pltpu.SemaphoreType.DMA((2 * nby,)),      # block out
            pltpu.SemaphoreType.DMA(()),              # wrap
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or default_vmem_limit(bz, by, ny,
                                                              nx, k),
        ),
        interpret=interpret,
    )


def stepk(
    f: jax.Array,
    mask_f: jax.Array,
    *,
    k_steps: int,
    omega: float,
    density: float,
    accel: float,
    accel_plane: int,
    bz: int | None = None,
    by: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
    mode: str = "full",
    plane_offset: jax.Array | int = 0,
    valid_planes: tuple | None = None,
    valid_rows: tuple | None = None,
    global_nz: int | None = None,
):
    """K fused 3-D timesteps in one in-place blocked HBM pass. Same
    contract as `d3q19_pallas.stepk(by=...)` (q-major layout); f and
    mask_f are the usual 4-D/3-D arrays — the 5-D block view is an
    internal free reshape."""
    _, nz, ny, nx = f.shape
    if bz is None or by is None:
        cbz, cby = choose_config(nz, ny, nx, k_steps)
        bz = cbz if bz is None else bz
        by = cby if by is None else by
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    all_valid = valid_planes is None and valid_rows is None
    if valid_planes is None:
        valid_planes = (0, nz)
    if valid_rows is None:
        valid_rows = (0, ny)
    call = _build_step(
        (nz, ny, nx), jnp.dtype(f.dtype).name, int(bz), int(by),
        int(k_steps), float(omega), float(density), float(accel),
        int(accel_plane), bool(interpret),
        None if vmem_limit is None else int(vmem_limit), str(mode),
        all_valid,
    )
    scal = jnp.stack(
        [jnp.asarray(global_nz if global_nz is not None else nz, jnp.int32),
         jnp.asarray(plane_offset, jnp.int32),
         jnp.asarray(valid_planes[0], jnp.int32),
         jnp.asarray(valid_planes[1], jnp.int32),
         jnp.asarray(valid_rows[0], jnp.int32),
         jnp.asarray(valid_rows[1], jnp.int32)]
    ).reshape(1, 6)
    nby = ny // int(by)
    f5 = f.reshape(19, nz, nby, int(by), nx)
    m5 = mask_f.reshape(nz, nby, int(by), nx)
    f_new, tots = call(scal, f5, m5)
    return f_new.reshape(19, nz, ny, nx), tots[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "k_steps", "omega", "density", "accel",
                     "accel_plane", "bz", "by", "interpret", "vmem_limit"),
)
def run(
    f: jax.Array,
    mask_f: jax.Array,
    *,
    num_steps: int,
    k_steps: int = 1,
    omega: float,
    density: float,
    accel: float,
    accel_plane: int,
    bz: int | None = None,
    by: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
):
    """`num_steps` 3-D timesteps under one lax.scan, `k_steps` per
    in-place blocked HBM pass — drop-in for `d3q19_pallas.run(by=...)`."""
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")

    def body(carry, _):
        f_new, tots = stepk(
            carry, mask_f, k_steps=k_steps, omega=omega, density=density,
            accel=accel, accel_plane=accel_plane, bz=bz, by=by,
            interpret=interpret, vmem_limit=vmem_limit,
        )
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)
