"""In-place (aliased) explicitly pipelined K-step D3Q19 z-slab kernel.

Same maths and slab decomposition as `d3q19_pallas`'s z-slab kernel (the
3-D analogue of the reference's fused LBM vertex — see d3q19_pallas.py for
the reference citations), but the HBM movement is an explicit 2-slot
`make_async_copy` pipeline whose K-step-advanced slabs are written back
INTO the input lattice (`input_output_aliases`): one HBM stream instead of
two.

Why: experiments/lbm3d-perf proved the automatic z-slab kernel sits at the
DMA floor of its access pattern (~290-310 GB/s; wall == copy, the math is
free), and experiments/d2q9-overlap identified the two-stream in/out
pattern as the cap — the SAME slab traffic aliased in place measures
~523 GB/s (2-D rank-3 version: 613). With the math already free, the 3-D
kernel's ceiling scales almost directly with the stream rate.

Correctness orderings (same scheme as ops/d2q9_pallas_inplace.py):
delayed write-back (slab i-1 flushes only after slab i's K-plane halo
fetch completed) and a prologue snapshot of planes [0, k) serving the
LAST slab's wraparound bottom halo. The obstacle mask is never written,
so its halo DMAs stay modular.

Kept in its own module so iterating here never shifts the source locations
embedded in the other engines' serialized Mosaic kernels (CLAUDE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import d3q19
from .d3q19_pallas import MAX_K


def default_vmem_limit(bz: int, ny: int, nx: int, k: int) -> int:
    """Right-sized scoped-VMEM budget: 2-slot in/out/halo/mask buffers plus
    the K-plane snapshot and ~3 live (bz+2K)-plane temporaries."""
    plane = ny * nx * 4
    slots = 2 * (19 * bz + 2 * 19 * k + bz + 2 * k + 19 * bz) * plane
    snap = 19 * k * plane
    temps = 19 * (bz + 2 * k) * plane * 3
    return min(120 * 1024 * 1024, int((slots + snap + temps) * 1.3))


def _kernel(scal_ref, f_hbm, mask_hbm, out_hbm, tot_ref,
            f_sl, p_sl, n_sl, m_sl, mp_sl, mn_sl, o_sl, wrap_sl,
            f_sem, p_sem, n_sem, m_sem, mp_sem, mn_sem, o_sem, wrap_sem,
            *, bz: int, k_steps: int, omega: float, density: float,
            accel: float, accel_plane: int, mode: str = "full",
            all_valid: bool = False):
    """All z-slabs of K fused timesteps, explicitly pipelined, written back
    in place. scal_ref carries (global_nz, plane_off, valid_lo, valid_hi,
    row_lo, row_hi) exactly as in d3q19_pallas._kernel (the y-row window
    excludes ghost ROWS of a (z, y)-sharded block from the Sum|u|;
    all_valid=True drops the exclusion entirely — the single-chip case);
    mode is DIAGNOSTIC ONLY."""
    nz = f_hbm.shape[1]
    ny = f_hbm.shape[2]
    nx = f_hbm.shape[3]
    nb = nz // bz
    k = k_steps
    dt = jnp.float32 if f_hbm.dtype == jnp.bfloat16 else f_hbm.dtype

    global_nz = scal_ref[0, 0]
    plane_off = scal_ref[0, 1]
    valid_lo = scal_ref[0, 2]
    valid_hi = scal_ref[0, 3]
    row_lo = scal_ref[0, 4]
    row_hi = scal_ref[0, 5]

    def f_dmas(slot, bi):
        prev0 = jax.lax.rem(bi * bz - k + nz, nz)
        z0 = bi * bz
        return (
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(z0, bz)], f_sl.at[slot], f_sem.at[slot]),
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(prev0, k)], p_sl.at[slot],
                p_sem.at[slot]),
        )

    def next_dma(slot, bi):
        next0 = jax.lax.rem(bi * bz + bz, nz)
        return pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(next0, k)], n_sl.at[slot], n_sem.at[slot])

    def mask_dmas(slot, bi):
        # the mask is never written: modular halos stay safe everywhere
        prev0 = jax.lax.rem(bi * bz - k + nz, nz)
        next0 = jax.lax.rem(bi * bz + bz, nz)
        z0 = bi * bz
        return (
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(z0, bz)], m_sl.at[slot], m_sem.at[slot]),
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(prev0, k)], mp_sl.at[slot],
                mp_sem.at[slot]),
            pltpu.make_async_copy(
                mask_hbm.at[pl.ds(next0, k)], mn_sl.at[slot],
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
            # wraparound: planes [0, k) as they were BEFORE slab 0's
            # in-place write — from the prologue snapshot
            n_sl[slot] = wrap_sl[...]

    def out_dma(slot, bi):
        return pltpu.make_async_copy(
            o_sl.at[slot], out_hbm.at[:, pl.ds(bi * bz, bz)],
            o_sem.at[slot])

    for j in range(k):  # SMEM accepts only scalar stores
        tot_ref[0, j] = jnp.zeros((), tot_ref.dtype)

    wrap_dma = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(0, k)], wrap_sl, wrap_sem)
    wrap_dma.start()
    start_in(0, 0)
    wrap_dma.wait()

    def roll_y(x, d):
        return pltpu.roll(x, d % ny, axis=x.ndim - 2)

    def roll_x(x, d):
        return pltpu.roll(x, d % nx, axis=x.ndim - 1)

    def streamed(ext, n_planes):
        def region(q, dz):
            return ext[q, 1 + dz: 1 + dz + n_planes]

        out = []
        for q in range(d3q19.NUM_SPEEDS):
            dz, dy, dx = (int(v) for v in d3q19.E[q])
            x = region(q, -dz)
            if dy:
                x = roll_y(x, dy)
            if dx:
                x = roll_x(x, dx)
            out.append(x)
        return out

    def body(bi, _):
        slot = jax.lax.rem(bi, 2)
        nxt = jax.lax.rem(bi + 1, 2)

        @pl.when(bi + 1 < nb)
        def _():
            start_in(nxt, bi + 1)

        wait_in(slot, bi)

        # in(bi) done => every reader of slab bi-1's planes has its data
        # (slab bi's top halo was the last one) => its in-place write-back
        # is safe to start now
        @pl.when(bi >= 1)
        def _():
            out_dma(nxt, bi - 1).start()

        @pl.when(bi >= 2)
        def _():
            out_dma(slot, bi - 2).wait()

        if mode == "copy":
            o_sl[slot] = f_sl[slot][...]
            tot_ref[0, 0] += jnp.sum(f_sl[slot][0, :1, :1].astype(dt))
            return 0

        state = jnp.concatenate(
            [p_sl[slot], f_sl[slot], n_sl[slot]], axis=1).astype(dt)
        if k > 1:
            mask_wide = jnp.concatenate(
                [mp_sl[slot][1:], m_sl[slot], mn_sl[slot][:k - 1]], axis=0)
        else:
            mask_wide = m_sl[slot][...]

        for j in range(1, k + 1):
            n_planes = bz + 2 * (k - j)
            lo = (k - 1) - (k - j)
            mask_j = mask_wide[lo:lo + n_planes] != 0
            planes_j = (bi * bz - (k - j) + plane_off) + \
                jax.lax.broadcasted_iota(jnp.int32, (n_planes, 1, 1), 0)
            amask_j = (jnp.mod(planes_j, global_nz) == accel_plane).astype(dt)
            if mode == "stream_only":
                state = jnp.stack(streamed(state, n_planes))
                u = state[0]
            else:
                state, u = d3q19.collide_fields(
                    streamed(state, n_planes), mask_j, amask_j,
                    omega=omega, density=density, accel=accel,
                )
            interior = u[k - j:k - j + bz]
            if all_valid:
                tot_ref[0, j - 1] += jnp.sum(interior)
            else:
                band_planes = bi * bz + jax.lax.broadcasted_iota(
                    jnp.int32, (bz, 1, 1), 0)
                rows = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
                valid = ((band_planes >= valid_lo)
                         & (band_planes < valid_hi)
                         & (rows >= row_lo) & (rows < row_hi))
                tot_ref[0, j - 1] += jnp.sum(
                    jnp.where(valid, interior, jnp.zeros((), dt)))

        o_sl[slot] = state.astype(o_sl.dtype)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out_dma((nb - 1) % 2, nb - 1).start()
    out_dma((nb - 2) % 2, nb - 2).wait()
    out_dma((nb - 1) % 2, nb - 1).wait()


@functools.lru_cache(maxsize=32)
def _build_step(shape, dtype_name, bz, k_steps, omega, density, accel,
                accel_plane, interpret, vmem_limit=None, mode="full",
                all_valid=False):
    nz, ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if nz % bz:
        raise ValueError(f"bz {bz} must divide nz {nz}")
    if nz // bz < 2:
        raise ValueError("in-place pipeline needs >= 2 slabs "
                         "(its epilogue drains slabs nb-2 and nb-1)")
    if not 1 <= k_steps <= MAX_K:
        raise ValueError(f"k_steps must be in 1..{MAX_K}")
    if k_steps > bz:
        raise ValueError("k_steps must not exceed bz (the K-plane halo "
                         "must fit within one neighbouring slab)")

    kernel = functools.partial(
        _kernel, bz=bz, k_steps=k_steps, omega=omega, density=density,
        accel=accel, accel_plane=accel_plane, mode=mode,
        all_valid=all_valid,
    )
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
            jax.ShapeDtypeStruct((19, nz, ny, nx), dtype),
            jax.ShapeDtypeStruct((1, k_steps), jnp.float32),
        ],
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 19, bz, ny, nx), dtype),   # f slab
            pltpu.VMEM((2, 19, k_steps, ny, nx), dtype),  # prev halo
            pltpu.VMEM((2, 19, k_steps, ny, nx), dtype),  # next halo
            pltpu.VMEM((2, bz, ny, nx), dtype),       # mask slab
            pltpu.VMEM((2, k_steps, ny, nx), dtype),  # mask prev halo
            pltpu.VMEM((2, k_steps, ny, nx), dtype),  # mask next halo
            pltpu.VMEM((2, 19, bz, ny, nx), dtype),   # out slab
            pltpu.VMEM((19, k_steps, ny, nx), dtype),  # wraparound snapshot
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
            vmem_limit_bytes=vmem_limit or default_vmem_limit(bz, ny, nx,
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
    density: float,
    accel: float,
    accel_plane: int,
    bz: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
    mode: str = "full",
    plane_offset: jax.Array | int = 0,
    valid_planes: tuple | None = None,
    valid_rows: tuple | None = None,
    global_nz: int | None = None,
):
    """K fused 3-D timesteps in one in-place HBM pass. Same contract as
    `d3q19_pallas.stepk` (q-major layout only; no by/zmajor variants —
    the aliased stream already lifts the slab pattern past both)."""
    _, nz, ny, nx = f.shape
    if bz is None:
        bz = max(k_steps, 4)
        while nz % bz:
            bz //= 2
        if bz < k_steps and nz % k_steps == 0:
            # halving landed below K but nz admits bz == K (the same
            # fallback pick_engine carries) — e.g. nz=6, k_steps=3
            bz = k_steps
        if nz // bz < 2:
            bz = max(b for b in range(1, nz) if nz % b == 0 and nz // b >= 2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    all_valid = valid_planes is None and valid_rows is None
    if valid_planes is None:
        valid_planes = (0, nz)
    if valid_rows is None:
        valid_rows = (0, ny)
    call = _build_step(
        (nz, ny, nx), jnp.dtype(f.dtype).name, int(bz), int(k_steps),
        float(omega), float(density), float(accel), int(accel_plane),
        bool(interpret),
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
    f_new, tots = call(scal, f, mask_f)
    return f_new, tots[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "k_steps", "omega", "density", "accel",
                     "accel_plane", "bz", "interpret", "vmem_limit"),
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
    interpret: bool | None = None,
    vmem_limit: int | None = None,
):
    """`num_steps` 3-D timesteps under one lax.scan, `k_steps` per
    in-place HBM pass — drop-in for `d3q19_pallas.run` (q-major)."""
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")

    def body(carry, _):
        f_new, tots = stepk(
            carry, mask_f, k_steps=k_steps, omega=omega, density=density,
            accel=accel, accel_plane=accel_plane, bz=bz,
            interpret=interpret, vmem_limit=vmem_limit,
        )
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)
