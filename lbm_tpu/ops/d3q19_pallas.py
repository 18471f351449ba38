"""Fused D3Q19 collide-and-stream Pallas kernel with K-step temporal blocking.

The 3-D instantiation of the stencil-engine design in d2q9_pallas.py: the
(19, nz, ny, nx) state is processed in z-slabs of BZ planes. The (ny, nx)
planes are the TPU-tiled dimensions (y rolls on sublanes, x rolls on lanes);
z is a batch dimension, so periodic z-halos are single (19, K, ny, nx) plane
blocks fetched via modular index maps — no alignment padding at all. A K-step
pass reads BZ+2K planes and writes BZ planes, the same 1/K HBM-traffic
scaling as the 2-D kernel.

Compute is always f32 (bf16 storage supported). The accelerated plane
(z = nz-2, the 3-D analogue of the reference's accelerated row) is applied
mod global nz so wrapped/ghost copies stay consistent, exactly like the 2-D
kernel's accelerated-row handling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import d3q19

MAX_K = 4


def default_vmem_limit(bz: int, ny: int, nx: int, k: int) -> int:
    plane = 19 * ny * nx * 4
    operands = (2 * bz * plane + 2 * k * plane + (bz + 2 * k) * ny * nx * 4) * 2
    scratch = (bz + 2 * k) * plane * 3
    return min(120 * 1024 * 1024, int((operands + scratch) * 1.35))


def choose_config(nz: int, ny: int, nx: int, k_steps: int = 2,
                  ) -> tuple[int, int | None]:
    """(bz, by) for `run`: z-slab when its working set fits VMEM, the
    (z, y)-blocked kernel beyond (large (ny, nx) planes — e.g. 256x256,
    where 19 x 5 MB planes blow the slab's VMEM at any bz >= k; measured in
    experiments/lbm3d-perf/sizes.csv). The 3-D analogue of the 2-D
    `choose_band` constant-working-set rule. by=None means slab."""
    k = k_steps
    bz = max(k, 4)
    while nz % bz:
        bz //= 2
    bz = max(bz, k) if nz % k == 0 else bz
    plane = 19 * ny * nx * 4
    # live slab bytes: ghost-extended in + out (double-buffered) + ~3
    # scratch copies of the extended slab. 110 MB threshold calibrated on
    # v5e (~128 MB VMEM): 64x128x256 @ bz=4/K=2 -> 90 MB compiles;
    # 32x256x256 -> 179 MB does not.
    if (4 * (bz + 2 * k) + bz) * plane <= 110 * 1024 * 1024:
        return bz, None
    # blocked: largest by (divisor of ny, multiple of 8 — _build_blocked's
    # hard constraints) whose ghost-extended block set stays under ~60 MB —
    # the regime measured at 600-850 GB/s effective DMA bandwidth
    legal = [b for b in range(8, min(ny, 256) + 1, 8) if ny % b == 0]
    if not legal:
        raise ValueError(
            f"no legal y-block for ny={ny} (needs a divisor that is a "
            "multiple of 8) and the z-slab working set exceeds VMEM at "
            f"{ny}x{nx} planes — pad ny to a multiple of 8 or use the "
            "jax engine")
    for by in sorted(legal, reverse=True):
        live = (19 * (bz + 2 * k) * (by + 2 * k) * nx * 4 * 4
                + 19 * bz * by * nx * 4)
        if live <= 60 * 1024 * 1024:
            return bz, by
    # even the smallest legal y-block blows the budget: raise the same
    # descriptive error as the no-legal-block path instead of returning a
    # config that dies later as an opaque Mosaic VMEM compile failure
    raise ValueError(
        f"smallest y-block (by={legal[0]}) still exceeds the VMEM budget "
        f"for {ny}x{nx} planes at bz={bz}, k={k} — pad ny to expose a "
        "smaller divisor or use the jax engine")


def _kernel(scal_ref, f_ref, prev_ref, next_ref, mask_ref, mprev_ref,
            mnext_ref, out_ref, tot_ref, *, bz: int, k_steps: int,
            omega: float, density: float, accel: float, accel_plane: int,
            mode: str = "full", layout: str = "qmajor",
            grid_ny: int | None = None, all_valid: bool = False):
    # mode is DIAGNOSTIC ONLY (experiments/lbm3d-perf): 'stream_only' skips
    # the BGK collision, 'collide_no_roll' skips the (y,x) rolls — used to
    # attribute kernel time between memory movement, rolls and arithmetic.
    # Production paths always use 'full'.
    #
    # all_valid=True (static, single-chip) drops the ghost-exclusion
    # `where` from the Sum|u| reduction — the same kept piece as the 2-D
    # in-place kernel's (d2q9_pallas_inplace._kernel). When False, the
    # (1,6) scal additionally windows y rows [row_lo, row_hi): ghost ROWS
    # of a (z, y)-sharded block (parallel/pallas_sharded_3d.simulate_zy)
    # duplicate a y-neighbour's cells and must not be double-counted.
    i = pl.program_id(0)
    global_nz = scal_ref[0, 0]
    plane_off = scal_ref[0, 1]   # local plane -> global plane (ghost blocks)
    valid_lo = scal_ref[0, 2]    # planes outside [valid_lo, valid_hi) are
    valid_hi = scal_ref[0, 3]    # ghost duplicates: excluded from Sum|u|
    row_lo = scal_ref[0, 4]      # same for y rows of a (z, y)-shard
    row_hi = scal_ref[0, 5]
    k = k_steps
    dt = jnp.float32 if f_ref.dtype == jnp.bfloat16 else f_ref.dtype
    # fused layout's refs are rank-3 (19, bz*ny, nx): ny comes in statically
    ny = grid_ny if layout == "fused" else f_ref.shape[-2]
    nx = f_ref.shape[-1]

    def roll_y(x, d):
        return pltpu.roll(x, d % ny, axis=x.ndim - 2)

    def roll_x(x, d):
        return pltpu.roll(x, d % nx, axis=x.ndim - 1)

    def streamed(ext, n_planes):
        # ext: (19, n_planes+2, ny, nx); pull speed q for the n_planes region
        def region(q, dz):
            return ext[q, 1 + dz : 1 + dz + n_planes]

        out = []
        for q in range(d3q19.NUM_SPEEDS):
            dz, dy, dx = (int(v) for v in d3q19.E[q])
            x = region(q, -dz)  # pull: from z - dz
            if dy:
                x = roll_y(x, dy)
            if dx:
                x = roll_x(x, dx)
            out.append(x)
        return out

    if mode == "copy":
        # diagnostic: pure DMA floor — out = in, no concat/rolls/math
        out_ref[:] = f_ref[:]

        @pl.when(i == 0)
        def _():
            for j in range(k):
                tot_ref[0, j] = jnp.zeros((), jnp.float32)

        tot_ref[0, 0] += jnp.sum(f_ref[0, :1, :1].astype(jnp.float32))
        return
    if layout == "zmajor":
        # z-major HBM layout (nz, 19, ny, nx): each slab block is ONE
        # contiguous DMA. Measured identical to q-major (TUNING.md) — kept
        # as the documented negative result.
        state = jnp.transpose(
            jnp.concatenate([prev_ref[:], f_ref[:], next_ref[:]], axis=0),
            (1, 0, 2, 3),
        ).astype(dt)
    elif layout == "fused":
        # fused-(z,y) layout: HBM array is (19, nz*ny, nx) so every block is
        # RANK-3 — the same block rank as the 2-D kernel, whose DMA pattern
        # reaches full duplex HBM bandwidth (experiments/d2q9-breakdown)
        # where the rank-4 3-D blocks measured only ~38% of peak. The
        # reshape back to 4-D is a free leading-dim split in VMEM.
        state = jnp.concatenate(
            [prev_ref[:].reshape(19, k, ny, nx),
             f_ref[:].reshape(19, bz, ny, nx),
             next_ref[:].reshape(19, k, ny, nx)], axis=1
        ).astype(dt)
    else:
        state = jnp.concatenate(
            [prev_ref[:], f_ref[:], next_ref[:]], axis=1
        ).astype(dt)
    if layout == "fused":
        mask_full = mask_ref[:].reshape(bz, ny, nx)
        mask_prev = mprev_ref[:].reshape(k, ny, nx)
        mask_next = mnext_ref[:].reshape(k, ny, nx)
    else:
        mask_full, mask_prev, mask_next = mask_ref[:], mprev_ref[:], mnext_ref[:]
    if k > 1:
        mask_wide = jnp.concatenate(
            [mask_prev[1:], mask_full, mask_next[: k - 1]], axis=0
        )
    else:
        mask_wide = mask_full

    @pl.when(i == 0)
    def _():
        for j in range(k):
            tot_ref[0, j] = jnp.zeros((), jnp.float32)

    for j in range(1, k + 1):
        n_planes = bz + 2 * (k - j)
        lo = (k - 1) - (k - j)
        mask_j = mask_wide[lo : lo + n_planes] != 0
        planes_j = (i * bz - (k - j) + plane_off) + jax.lax.broadcasted_iota(
            jnp.int32, (n_planes, 1, 1), 0
        )
        amask_j = (jnp.mod(planes_j, global_nz) == accel_plane).astype(dt)
        if mode == "stream_only":
            state = jnp.stack(streamed(state, n_planes))
            u = state[0]
        else:
            if mode == "collide_no_roll":
                s_in = [state[q, 1 + int(d) : 1 + int(d) + n_planes]
                        for q, d in enumerate(-d3q19.E[:, 0])]
            else:
                s_in = streamed(state, n_planes)
            state, u = d3q19.collide_fields(
                s_in, mask_j, amask_j,
                omega=omega, density=density, accel=accel,
            )
        interior = u[k - j : k - j + bz]
        if all_valid:
            tot_ref[0, j - 1] += jnp.sum(interior)
        else:
            band_planes = i * bz + jax.lax.broadcasted_iota(
                jnp.int32, (bz, 1, 1), 0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
            valid = ((band_planes >= valid_lo) & (band_planes < valid_hi)
                     & (rows >= row_lo) & (rows < row_hi))
            tot_ref[0, j - 1] += jnp.sum(
                jnp.where(valid, interior, jnp.zeros((), dt)))

    if layout == "zmajor":
        out_ref[:] = jnp.transpose(state, (1, 0, 2, 3)).astype(out_ref.dtype)
    elif layout == "fused":
        out_ref[:] = state.reshape(19, bz * ny, nx).astype(out_ref.dtype)
    else:
        out_ref[:] = state.astype(out_ref.dtype)


@functools.lru_cache(maxsize=32)
def _build_step(shape, dtype_name, bz, k_steps, omega, density, accel,
                accel_plane, interpret, vmem_limit=None, mode="full",
                layout="qmajor", all_valid=False):
    nz, ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if nz % bz:
        raise ValueError(f"bz {bz} must divide nz {nz}")
    if not 1 <= k_steps <= MAX_K:
        raise ValueError(f"k_steps must be in 1..{MAX_K}")
    if bz % k_steps:
        # _prev_idx/_next_idx address K-plane halo blocks in units that
        # assume bz is a multiple of k_steps; violating it silently fetches
        # misaligned ghost planes (wrong physics, no error).
        raise ValueError(
            f"bz ({bz}) must be a multiple of k_steps ({k_steps}); "
            f"pick k_steps dividing nz ({nz}) or pass bz explicitly")
    grid = nz // bz

    kernel = functools.partial(
        _kernel, bz=bz, k_steps=k_steps, omega=omega, density=density,
        accel=accel, accel_plane=accel_plane, mode=mode, layout=layout,
        grid_ny=ny, all_valid=all_valid,
    )
    k = k_steps
    if layout == "fused":
        # (19, nz*ny, nx): rank-3 blocks, identical bytes to q-major
        f_spec = pl.BlockSpec((19, bz * ny, nx), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        prev_spec = pl.BlockSpec(
            (19, k * ny, nx), lambda i: (0, _prev_idx(i, bz, k, nz), 0),
            memory_space=pltpu.VMEM)
        next_spec = pl.BlockSpec(
            (19, k * ny, nx), lambda i: (0, _next_idx(i, bz, k, nz), 0),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((19, bz * ny, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out_state = jax.ShapeDtypeStruct((19, nz * ny, nx), dtype)
    elif layout == "zmajor":
        # (nz, 19, ny, nx): slab + halo blocks are single contiguous runs
        f_spec = pl.BlockSpec((bz, 19, ny, nx), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        prev_spec = pl.BlockSpec(
            (k, 19, ny, nx), lambda i: (_prev_idx(i, bz, k, nz), 0, 0, 0),
            memory_space=pltpu.VMEM)
        next_spec = pl.BlockSpec(
            (k, 19, ny, nx), lambda i: (_next_idx(i, bz, k, nz), 0, 0, 0),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bz, 19, ny, nx), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_state = jax.ShapeDtypeStruct((nz, 19, ny, nx), dtype)
    else:
        f_spec = pl.BlockSpec((19, bz, ny, nx), lambda i: (0, i, 0, 0),
                              memory_space=pltpu.VMEM)
        # K z-planes ENDING at plane i*bz - 1 (periodic)
        prev_spec = pl.BlockSpec(
            (19, k, ny, nx), lambda i: (0, _prev_idx(i, bz, k, nz), 0, 0),
            memory_space=pltpu.VMEM)
        next_spec = pl.BlockSpec(
            (19, k, ny, nx), lambda i: (0, _next_idx(i, bz, k, nz), 0, 0),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((19, bz, ny, nx), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_state = jax.ShapeDtypeStruct((19, nz, ny, nx), dtype)
    if layout == "fused":
        mask_spec = pl.BlockSpec((bz * ny, nx), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        mprev_spec = pl.BlockSpec(
            (k * ny, nx), lambda i: (_prev_idx(i, bz, k, nz), 0),
            memory_space=pltpu.VMEM)
        mnext_spec = pl.BlockSpec(
            (k * ny, nx), lambda i: (_next_idx(i, bz, k, nz), 0),
            memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        mprev_spec = pl.BlockSpec(
            (k, ny, nx), lambda i: (_prev_idx(i, bz, k, nz), 0, 0),
            memory_space=pltpu.VMEM)
        mnext_spec = pl.BlockSpec(
            (k, ny, nx), lambda i: (_next_idx(i, bz, k, nz), 0, 0),
            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            f_spec,
            prev_spec,
            next_spec,
            mask_spec,
            mprev_spec,
            mnext_spec,
        ],
        out_specs=[
            out_spec,
            pl.BlockSpec((1, k_steps), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            out_state,
            jax.ShapeDtypeStruct((1, k_steps), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or default_vmem_limit(bz, ny, nx, k_steps),
        ),
        interpret=interpret,
    )


def _prev_idx(i, bz, k, nz):
    # block index (in k-plane units) whose LAST plane is global plane i*bz-1
    return ((i * bz - k) % nz) // k


def _next_idx(i, bz, k, nz):
    return ((i * bz + bz) % nz) // k


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
    layout: str = "qmajor",
    plane_offset: jax.Array | int = 0,
    valid_planes: tuple | None = None,
    valid_rows: tuple | None = None,
    global_nz: int | None = None,
):
    """K fused 3-D timesteps. mask_f: (nz, ny, nx) {0,1}. Returns
    (f_after_K, tot_u per step (K,) f32).

    layout='qmajor' takes f as (19, nz, ny, nx); layout='zmajor' takes
    (nz, 19, ny, nx), whose slab blocks are single contiguous DMAs (the
    faster layout on TPU — see experiments/lbm3d-perf).

    plane_offset / valid_planes / global_nz support ghost-extended z-shard
    blocks (parallel/pallas_sharded_3d.py): local plane p is global plane
    p + plane_offset (accel labels taken mod global_nz), and only local
    planes in [valid_planes) contribute to the Sum|u|. valid_rows is the
    y-axis analogue for (z, y)-sharded blocks (simulate_zy): only local y
    rows in [valid_rows) contribute (ghost rows duplicate a y-neighbour's
    cells). When both are None the reduction drops the exclusion `where`
    entirely (the single-chip case)."""
    if layout == "zmajor":
        nz, _, ny, nx = f.shape
    else:
        _, nz, ny, nx = f.shape
    if bz is None:
        bz = max(k_steps, 4)
        while nz % bz:
            bz //= 2
    # halo blocks are k z-planes: their modular index maps assume k | i*bz-k
    # strides, which holds when k divides nz and bz
    if nz % k_steps or bz % k_steps:
        raise ValueError("k_steps must divide nz and bz")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    all_valid = valid_planes is None and valid_rows is None
    call = _build_step(
        (nz, ny, nx), jnp.dtype(f.dtype).name, int(bz), int(k_steps),
        float(omega), float(density), float(accel), int(accel_plane),
        bool(interpret),
        None if vmem_limit is None else int(vmem_limit), str(mode),
        str(layout), all_valid,
    )
    if valid_planes is None:
        valid_planes = (0, nz)
    if valid_rows is None:
        valid_rows = (0, ny)
    scal = jnp.stack(
        [jnp.asarray(global_nz if global_nz is not None else nz, jnp.int32),
         jnp.asarray(plane_offset, jnp.int32),
         jnp.asarray(valid_planes[0], jnp.int32),
         jnp.asarray(valid_planes[1], jnp.int32),
         jnp.asarray(valid_rows[0], jnp.int32),
         jnp.asarray(valid_rows[1], jnp.int32)]
    ).reshape(1, 6)
    if by is not None:
        # (z, y)-blocked kernel: small blocks pipeline at ~2x the bandwidth
        # of z-slabs and leave VMEM headroom for K=4 (see module comment)
        if mode != "full" or layout != "qmajor":
            raise ValueError(
                f"mode={mode!r}/layout={layout!r} apply to the z-slab "
                "kernel only; the (z,y)-blocked path (by=...) has no "
                "diagnostic modes or alternate layouts")
        call = _build_blocked(
            (nz, ny, nx), jnp.dtype(f.dtype).name, int(bz), int(by),
            int(k_steps), float(omega), float(density), float(accel),
            int(accel_plane), bool(interpret),
            None if vmem_limit is None else int(vmem_limit), all_valid,
        )
        m = mask_f
        f_new, tots = call(scal, f, f, f, f, f, f, f, f, f,
                           m, m, m, m, m, m, m, m, m)
        return f_new, tots[0]
    if layout == "fused":
        # same bytes, rank-3 view: free reshapes at the HBM boundary
        f_c = f.reshape(19, nz * ny, nx)
        m_c = mask_f.reshape(nz * ny, nx)
        f_new, tots = call(scal, f_c, f_c, f_c, m_c, m_c, m_c)
        return f_new.reshape(19, nz, ny, nx), tots[0]
    f_new, tots = call(scal, f, f, f, mask_f, mask_f, mask_f)
    return f_new, tots[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "k_steps", "omega", "density", "accel",
                     "accel_plane", "bz", "by", "interpret", "vmem_limit",
                     "layout"),
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
    layout: str = "qmajor",
):
    """Callers always pass q-major (19, nz, ny, nx); layout='zmajor'
    transposes once at entry/exit of the scan and runs the
    contiguous-slab-DMA kernel inside."""
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")
    if layout == "zmajor":
        f = jnp.transpose(f, (1, 0, 2, 3))

    def body(carry, _):
        f_new, tots = stepk(
            carry, mask_f, k_steps=k_steps, omega=omega, density=density,
            accel=accel, accel_plane=accel_plane, bz=bz, by=by,
            interpret=interpret, vmem_limit=vmem_limit, layout=layout,
        )
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    if layout == "zmajor":
        f_final = jnp.transpose(f_final, (1, 0, 2, 3))
    return f_final, tots.reshape(num_steps)


# ---------------------------------------------------------------------------
# (z, y)-blocked kernel: small blocks, 2-D grid, 9-block halo stitching.
#
# Measured motivation (experiments/lbm3d-perf, d2q9-breakdown): the z-slab
# kernel is DMA-bound at ~300 GB/s regardless of layout/rank/arithmetic,
# while the same data volume moved as MANY SMALL rank-3 blocks (the 2-D
# kernel's regime) reaches 600-850 GB/s. Blocking y as well shrinks blocks
# ~8x into that regime AND frees VMEM for K=4 temporal blocking.
# ---------------------------------------------------------------------------


def _blocked_kernel(scal_ref, f_ref, zp_ref, zn_ref, yp_ref, yn_ref,
                    czpyp_ref, czpyn_ref, cznyp_ref, cznyn_ref,
                    m_ref, mzp_ref, mzn_ref, myp_ref, myn_ref,
                    mczpyp_ref, mczpyn_ref, mcznyp_ref, mcznyn_ref,
                    out_ref, tot_ref, *, bz: int, by: int, k_steps: int,
                    omega: float, density: float, accel: float,
                    accel_plane: int, all_valid: bool = False):
    iz = pl.program_id(0)
    iy = pl.program_id(1)
    global_nz = scal_ref[0, 0]
    plane_off = scal_ref[0, 1]
    valid_lo = scal_ref[0, 2]
    valid_hi = scal_ref[0, 3]
    row_lo = scal_ref[0, 4]
    row_hi = scal_ref[0, 5]
    k = k_steps
    dt = jnp.float32 if f_ref.dtype == jnp.bfloat16 else f_ref.dtype
    nx = f_ref.shape[-1]

    def roll_x(x, d):
        return pltpu.roll(x, d % nx, axis=x.ndim - 1)

    def y_ext(center, ypb, ynb, width):
        # center (19|1, Z, Y, nx) + 8-row y-halo blocks -> Y + 2*width rows
        return jnp.concatenate(
            [ypb[..., 8 - width : 8, :], center, ynb[..., 0:width, :]],
            axis=-2)

    # assemble the (19, bz+2k, by+2k, nx) ghost-extended state
    center = y_ext(f_ref[:], yp_ref[:], yn_ref[:], k)
    zprev = y_ext(zp_ref[:], czpyp_ref[:], czpyn_ref[:], k)
    znext = y_ext(zn_ref[:], cznyp_ref[:], cznyn_ref[:], k)
    state = jnp.concatenate([zprev, center, znext], axis=1).astype(dt)

    if k > 1:
        m_center = y_ext(m_ref[:], myp_ref[:], myn_ref[:], k - 1)
        m_zprev = y_ext(mzp_ref[:], mczpyp_ref[:], mczpyn_ref[:], k - 1)
        m_znext = y_ext(mzn_ref[:], mcznyp_ref[:], mcznyn_ref[:], k - 1)
        # z-extent of mask_wide is bz + 2(k-1): the LAST k-1 planes of
        # m_zprev and the FIRST k-1 of m_znext
        mask_wide = jnp.concatenate(
            [m_zprev[1:], m_center, m_znext[: k - 1]], axis=0)
    else:
        mask_wide = m_ref[:]

    @pl.when(jnp.logical_and(iz == 0, iy == 0))
    def _():
        for j in range(k):
            tot_ref[0, j] = jnp.zeros((), jnp.float32)

    def streamed(ext, n_z, n_y):
        out = []
        for q in range(d3q19.NUM_SPEEDS):
            dz, dy, dx = (int(v) for v in d3q19.E[q])
            x = ext[q, 1 - dz : 1 - dz + n_z, 1 - dy : 1 - dy + n_y, :]
            if dx:
                x = roll_x(x, dx)
            out.append(x)
        return out

    for j in range(1, k + 1):
        n_z = bz + 2 * (k - j)
        n_y = by + 2 * (k - j)
        lo = (k - 1) - (k - j)
        mask_j = mask_wide[lo : lo + n_z, lo : lo + n_y, :] != 0
        planes_j = (iz * bz - (k - j) + plane_off) + jax.lax.broadcasted_iota(
            jnp.int32, (n_z, 1, 1), 0)
        amask_j = (jnp.mod(planes_j, global_nz) == accel_plane).astype(dt)
        state_list, u = d3q19.collide_fields(
            streamed(state, n_z, n_y), mask_j, amask_j,
            omega=omega, density=density, accel=accel)
        state = state_list
        interior = u[k - j : k - j + bz, k - j : k - j + by]
        if all_valid:
            tot_ref[0, j - 1] += jnp.sum(interior)
        else:
            band_planes = iz * bz + jax.lax.broadcasted_iota(
                jnp.int32, (bz, 1, 1), 0)
            rows = iy * by + jax.lax.broadcasted_iota(
                jnp.int32, (1, by, 1), 1)
            valid = ((band_planes >= valid_lo) & (band_planes < valid_hi)
                     & (rows >= row_lo) & (rows < row_hi))
            tot_ref[0, j - 1] += jnp.sum(
                jnp.where(valid, interior, jnp.zeros((), dt)))

    out_ref[:] = state.astype(out_ref.dtype)


@functools.lru_cache(maxsize=32)
def _build_blocked(shape, dtype_name, bz, by, k_steps, omega, density,
                   accel, accel_plane, interpret, vmem_limit=None,
                   all_valid=False):
    nz, ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if nz % bz or ny % by or by % 8:
        raise ValueError(f"bz {bz} must divide nz {nz}; by {by} must divide "
                         f"ny {ny} and be a multiple of 8")
    if not 1 <= k_steps <= MAX_K:
        raise ValueError(f"k_steps must be in 1..{MAX_K}")
    k = k_steps
    gz, gy = nz // bz, ny // by
    yb8 = by // 8
    nyb8 = ny // 8

    def ym(iy, d):  # 8-row y-halo block index (periodic)
        return (iy * yb8 - 1) % nyb8 if d < 0 else (iy * yb8 + yb8) % nyb8

    kernel = functools.partial(
        _blocked_kernel, bz=bz, by=by, k_steps=k, omega=omega,
        density=density, accel=accel, accel_plane=accel_plane,
        all_valid=all_valid)

    def S(zdim, ydim, zmap, ymap, lead=True):
        if lead:
            return pl.BlockSpec(
                (19, zdim, ydim, nx),
                lambda iz, iy, zm=zmap, yw=ymap: (0, zm(iz), yw(iy), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (zdim, ydim, nx),
            lambda iz, iy, zm=zmap, yw=ymap: (zm(iz), yw(iy), 0),
            memory_space=pltpu.VMEM)

    zc = lambda iz: iz
    zp = lambda iz: _prev_idx(iz, bz, k, nz)
    zn = lambda iz: _next_idx(iz, bz, k, nz)
    yc = lambda iy: iy
    yp = lambda iy: ym(iy, -1)
    yn = lambda iy: ym(iy, +1)

    in_specs = [
        pl.BlockSpec((1, 6), lambda iz, iy: (0, 0), memory_space=pltpu.SMEM),
        S(bz, by, zc, yc), S(k, by, zp, yc), S(k, by, zn, yc),
        S(bz, 8, zc, yp), S(bz, 8, zc, yn),
        S(k, 8, zp, yp), S(k, 8, zp, yn), S(k, 8, zn, yp), S(k, 8, zn, yn),
        S(bz, by, zc, yc, lead=False), S(k, by, zp, yc, lead=False),
        S(k, by, zn, yc, lead=False),
        S(bz, 8, zc, yp, lead=False), S(bz, 8, zc, yn, lead=False),
        S(k, 8, zp, yp, lead=False), S(k, 8, zp, yn, lead=False),
        S(k, 8, zn, yp, lead=False), S(k, 8, zn, yn, lead=False),
    ]
    # operand blocks (f center+out, z/y halos, corners, mask variants),
    # double-buffered, plus ~3 live copies of the ghost-extended state
    blk = (2 * bz * by + 2 * k * by + 2 * bz * 8 + 4 * k * 8) * nx * 4
    operands = blk * 19 + blk  # state blocks + mask blocks
    scratch = 19 * (bz + 2 * k) * (by + 2 * k) * nx * 4 * 3
    return pl.pallas_call(
        kernel,
        grid=(gz, gy),
        in_specs=in_specs,
        out_specs=[
            S(bz, by, zc, yc),
            pl.BlockSpec((1, k), lambda iz, iy: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((19, nz, ny, nx), dtype),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or min(
                120 * 1024 * 1024, int((operands * 2 + scratch) * 1.35)),
        ),
        interpret=interpret,
    )
