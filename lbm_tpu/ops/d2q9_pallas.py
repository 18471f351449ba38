"""Fused D2Q9 collide-and-stream as a single Pallas TPU kernel, with
K-deep temporal blocking.

The TPU analogue of the reference's hot vertex `LbmTimeStepVertex`
(main/codelets/D2Q9Codelets.cpp:94-191) and of its `two_timesteps` compiled
program (main/LbmAoS.cpp:135-216): one pass over HBM performs K whole
timesteps — pull-streaming, obstacle rebound, BGK collision, accelerated-row
force and the per-step Sum|u| partial — with every intermediate lattice living
only in VMEM.

Decomposition (the analogue of the reference's tile mapping,
main/include/StructuredGridUtils.hpp): the (9, H, W) state is processed in
row *bands* of B rows. A K-step pass over band i needs K halo rows above and
below (rows i*B-K .. i*B+B+K-1); these are fetched as 8-row sublane-aligned
blocks of the same input with periodic wraparound encoded in the BlockSpec
index_map (`(i*B//8 - 1) % (H//8)`), so the pipeline DMAs B+16 input rows and
writes B rows per K steps — HBM traffic per step falls as 1/K, which is why
K=2..4 beats the already-fused single-step kernel. Column wraparound is a
cheap in-VMEM `pltpu.roll` of full lanes. Rows recomputed by adjacent bands
(the 2(K-j) overlap rows of step j) are bit-identical within a pass, so the
result is band-decomposition-independent; versus K separate K=1 steps the
result agrees to ~1 ulp, not bitwise — kernels compiled at different K get
different instruction selection (measured in tests/test_checkpoint.py, which
is why checkpoint chunks must keep one K).

The per-band per-step Sum|u| partials accumulate into a (1, K) SMEM output
across the sequential TPU grid — the analogue of the reference's on-device
popops::reduceWithOutput + AppendReducedSum pipeline (main/LbmSimple.cpp:28-97).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import Params
from . import d2q9

DEF_VMEM_BUDGET = 64 * 1024 * 1024  # conservative per-core VMEM budget (bytes)
MAX_STEPS_PER_PASS = 8  # halo blocks are 8 rows -> K <= 8


def default_vmem_limit(band: int, nx: int, k_steps: int) -> int:
    """Right-sized scoped-VMEM budget for the K-step kernel.

    Measured on v5e at 1024^2/band=128/K=4: a ~45MB budget yields 11.5k
    MLUPS vs 8.7k at the flat 100MB default — the tighter budget steers the
    Mosaic scheduler into a leaner, better-pipelined allocation
    (experiments/effect-of-vmem-limit). Estimate = double-buffered operand
    blocks + ~3 live region temporaries, with 35% headroom.
    """
    operands = (2 * 9 * band * nx + 2 * 9 * 8 * nx + band * nx + 2 * 8 * nx) * 4 * 2
    scratch = 9 * (band + 2 * k_steps) * nx * 4 * 3
    return min(120 * 1024 * 1024, int((operands + scratch) * 1.35))


def choose_band(h: int, w: int, vmem_budget: int = 32 * 1024 * 1024) -> int:
    """Band height B (multiple of 8, divides H) for the fused kernel.

    Measured on v5e (experiments/min-band-size, large-grid sweeps): the
    optimum is a roughly constant working set (band 128 at W=1024, 64 at
    2048, 32 at 4096, 16 at 8192) — a wider band amortises the 16/B halo
    rows but loses more to VMEM pressure in the pipeline. The 32MB budget
    reproduces every measured optimum; the earlier 24MB figure degraded
    8192² to band 8 (8,460 vs 9,690 MLUPS at band 16, sweep8192.csv): the
    halo term (2*9*8*W) grows with width and was eating the band's share.
    Take the largest B <= 128 whose working set fits the budget."""
    best = 8
    for b in range(8, min(h, 128) + 1, 8):
        if h % b:
            continue
        # bytes: (2*9*B*W f32 in/out + 2*9*8*W halos + B*W mask) * 2 (pipeline)
        working = (2 * 9 * b * w + 2 * 9 * 8 * w + b * w) * 4 * 2
        if working <= vmem_budget:
            best = b
    return best


def _kernel(scal_ref, f_ref, prev_ref, next_ref, mask_ref, mprev_ref,
            mnext_ref, out_ref, tot_ref, *, band: int, k_steps: int,
            omega: float, accel_w1: float, accel_w2: float, accel_row: int,
            shared_reciprocal: bool = False, mode: str = "full"):
    # mode is DIAGNOSTIC ONLY (experiments/d2q9-breakdown): 'stream_only'
    # skips the BGK collision, 'copy' skips everything — used to attribute
    # kernel time between memory movement and arithmetic.
    """K fused timesteps on one band. See module docstring for the scheme.

    scal_ref (SMEM int32 (1,6)) holds (row_offset, valid_lo, valid_hi,
    global_ny, col_lo, col_hi): row_offset maps local row index -> global row
    (nonzero when the array is a shard's ghost-extended block,
    parallel/pallas_sharded.py); rows outside [valid_lo, valid_hi) and
    columns outside [col_lo, col_hi) are ghost duplicates excluded from the
    Sum|u|; the accelerated-row test is taken mod global_ny so wrapped /
    ghost copies of the accelerated row receive the force too.
    """
    i = pl.program_id(0)
    row_offset = scal_ref[0, 0]
    valid_lo = scal_ref[0, 1]
    valid_hi = scal_ref[0, 2]
    global_ny = scal_ref[0, 3]
    col_lo = scal_ref[0, 4]
    col_hi = scal_ref[0, 5]
    w = f_ref.shape[-1]
    # bf16 is a storage-only format (TPU rotates need 32-bit lanes): compute
    # in f32. f32/f64 storage computes in its own precision (f64 is the CPU
    # golden-verification path; TPU hardware is f32).
    dt = jnp.float32 if f_ref.dtype == jnp.bfloat16 else f_ref.dtype
    k = k_steps

    def east(x):
        return pltpu.roll(x, 1, axis=x.ndim - 1)

    def west(x):
        return pltpu.roll(x, w - 1, axis=x.ndim - 1)

    def streamed(ext, n_rows):
        # ext has n_rows+2 rows; returns the 9 pulled planes on the
        # n_rows-row interior region.
        def up(q):
            return ext[q, 0:n_rows, :]

        def down(q):
            return ext[q, 2 : n_rows + 2, :]

        def mid(q):
            return ext[q, 1 : n_rows + 1, :]

        return (
            mid(0), east(mid(1)), up(2), west(mid(3)), down(4),
            east(up(5)), west(up(6)), west(down(7)), east(down(8)),
        )

    # state_0: rows i*B-K .. i*B+B+K-1  (band + 2K rows)
    state = jnp.concatenate(
        [prev_ref[:, 8 - k : 8, :], f_ref[:], next_ref[:, 0:k, :]], axis=1
    ).astype(dt)
    # obstacle mask over the widest step-1 region: rows i*B-(K-1) .. i*B+B+K-2
    if k > 1:
        mask_wide = jnp.concatenate(
            [mprev_ref[8 - (k - 1) : 8, :], mask_ref[:], mnext_ref[0 : k - 1, :]],
            axis=0,
        )
    else:
        mask_wide = mask_ref[:]

    @pl.when(i == 0)
    def _():
        for j in range(k):  # SMEM only accepts scalar stores
            tot_ref[0, j] = jnp.zeros((), dt)

    band_rows = i * band + jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    valid_cells = ((band_rows >= valid_lo) & (band_rows < valid_hi)
                   & (cols >= col_lo) & (cols < col_hi))

    if mode == "copy":
        out_ref[:] = f_ref[:]
        tot_ref[0, 0] += jnp.sum(f_ref[0, :1, :128].astype(dt))
        return

    for j in range(1, k + 1):
        n_rows = band + 2 * (k - j)  # rows of this step's output region
        lo = (k - 1) - (k - j)  # offset of the region within mask_wide
        mask_j = mask_wide[lo : lo + n_rows, :] != 0
        rows_j = (i * band - (k - j) + row_offset) + jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, 1), 0
        )
        # mod global_ny: overlap/ghost rows are wrapped copies and must see
        # the same force as the rows they duplicate
        amask_j = (jnp.mod(rows_j, global_ny) == accel_row).astype(dt)
        if mode == "stream_only":
            state = jnp.stack(streamed(state, n_rows))
            u = state[0]
        else:
            state, u = d2q9.collide_fields(
                streamed(state, n_rows), mask_j, amask_j,
                omega=omega, accel_w1=accel_w1, accel_w2=accel_w2,
                shared_reciprocal=shared_reciprocal,
            )
        # Sum|u| over this band's own valid B rows only (overlap rows belong
        # to the neighbouring bands; ghost rows duplicate other shards).
        interior = u[k - j : k - j + band, :]
        tot_ref[0, j - 1] += jnp.sum(
            jnp.where(valid_cells, interior, jnp.zeros((), dt))
        )

    out_ref[:] = state.astype(out_ref.dtype)


@functools.lru_cache(maxsize=64)
def _build_step(shape, dtype_name, band, k_steps, omega, accel_w1, accel_w2,
                accel_row, interpret, vmem_limit=None,
                shared_reciprocal=False, mode="full"):
    ny, nx = shape
    dtype = jnp.dtype(dtype_name)
    if ny % band or band % 8:
        raise ValueError(f"band {band} must divide ny {ny} and be a multiple of 8")
    if not 1 <= k_steps <= MAX_STEPS_PER_PASS:
        raise ValueError(f"k_steps must be in 1..{MAX_STEPS_PER_PASS}")
    if k_steps > 1 and ny < 2 * 8:
        raise ValueError("k_steps > 1 needs at least two 8-row blocks")
    grid = ny // band
    nblk8 = ny // 8
    bb8 = band // 8

    kernel = functools.partial(
        _kernel, band=band, k_steps=k_steps, omega=omega,
        accel_w1=accel_w1, accel_w2=accel_w2, accel_row=accel_row,
        shared_reciprocal=shared_reciprocal, mode=mode,
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9, band, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            # 8-row block whose LAST row is global row i*B - 1 (periodic)
            pl.BlockSpec((9, 8, nx), lambda i: (0, (i * bb8 - 1) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            # 8-row block whose FIRST row is global row i*B + B (periodic)
            pl.BlockSpec((9, 8, nx), lambda i: (0, (i * bb8 + bb8) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), lambda i: ((i * bb8 - 1) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nx), lambda i: ((i * bb8 + bb8) % nblk8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, band, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_steps), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct(
                (1, k_steps),
                jnp.float64 if dtype == jnp.float64 else jnp.float32,
            ),
        ],
        cost_estimate=pl.CostEstimate(
            flops=k_steps * 75 * ny * nx,
            bytes_accessed=(2 * 9 + 1) * ny * nx * dtype.itemsize,
            transcendentals=k_steps * ny * nx,  # sqrt
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or default_vmem_limit(band, nx, k_steps),
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
    shared_reciprocal: bool = False,
    mode: str = "full",
):
    """K fused timesteps in one HBM pass. `mask_f` is the obstacle mask as
    {0,1} in f.dtype. Returns (f_after_K_steps, tot_u per step (K,)).

    row_offset / valid_rows / valid_cols support ghost-extended shard blocks
    (see parallel/pallas_sharded.py): local row r is global row
    r + row_offset, and only local cells in [valid_rows) x [valid_cols)
    contribute to the Sum|u|.
    """
    _, ny, nx = f.shape
    if band is None:
        # the band optimum depends on K: K>=6 amortises its halo recompute
        # only at ~double the K=4 band width (experiments/large-grid)
        band = choose_band(ny, nx, LARGE_GRID_VMEM_BUDGET) \
            if k_steps >= 6 else choose_band(ny, nx)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if valid_rows is None:
        valid_rows = (0, ny)
    if valid_cols is None:
        valid_cols = (0, nx)
    call = _build_step(
        (ny, nx), jnp.dtype(f.dtype).name, band, int(k_steps), float(omega),
        float(accel_w1), float(accel_w2), int(accel_row), bool(interpret),
        None if vmem_limit is None else int(vmem_limit),
        bool(shared_reciprocal), str(mode),
    )
    scal = jnp.stack(
        [jnp.asarray(row_offset, jnp.int32),
         jnp.asarray(valid_rows[0], jnp.int32),
         jnp.asarray(valid_rows[1], jnp.int32),
         jnp.asarray(global_ny if global_ny is not None else ny, jnp.int32),
         jnp.asarray(valid_cols[0], jnp.int32),
         jnp.asarray(valid_cols[1], jnp.int32)]
    ).reshape(1, 6)
    f_new, tots = call(scal, f, f, f, mask_f, mask_f, mask_f)
    return f_new, tots[0]


def step(f, mask_f, **kw):
    """One fused timestep. Returns (f', tot_u scalar)."""
    f_new, tots = stepk(f, mask_f, k_steps=1, **kw)
    return f_new, tots[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "k_steps", "omega", "accel_w1", "accel_w2",
                     "accel_row", "band", "interpret", "vmem_limit",
                     "shared_reciprocal"),
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
    shared_reciprocal: bool = False,
):
    """`num_steps` fused timesteps under one lax.scan (device-resident loop),
    `k_steps` of them per HBM pass. num_steps must be a multiple of k_steps.
    Returns (f_final, tot_u of shape (num_steps,))."""
    if num_steps % k_steps:
        raise ValueError(f"num_steps {num_steps} not a multiple of k_steps {k_steps}")

    def body(carry, _):
        f_new, tots = stepk(
            carry, mask_f, k_steps=k_steps, omega=omega, accel_w1=accel_w1,
            accel_w2=accel_w2, accel_row=accel_row, band=band,
            interpret=interpret, vmem_limit=vmem_limit,
            shared_reciprocal=shared_reciprocal,
        )
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)


def simulate(params: Params, f: jax.Array, obstacle_mask: jax.Array,
             k_steps: int | None = None, **kw):
    """Reference-semantics full simulation on the Pallas engine.
    Same contract as d2q9.simulate. Defaults to `choose_config`'s measured
    (band, K) optimum for the grid (K=4 on VMEM-resident grids, K=8 at a
    wider band beyond), falling back to the deepest K dividing max_iters —
    the reference's Repeat(maxIters/2, two_timesteps) analogue
    (main/LbmAoS.cpp:354-356)."""
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
            (k for k in (preferred, 4, 2, 1)
             if params.max_iters % k == 0 and params.ny >= 16),
            1,
        )
    # band defaults inside stepk, matched to the K actually used
    f_final, tot_u = run(
        f, mask_f, num_steps=params.max_iters, omega=params.omega,
        accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row,
        k_steps=k_steps, **kw,
    )
    num_free = jnp.asarray((~obstacle_mask).sum(), dtype=f.dtype)
    return f_final, tot_u / num_free


# -- production (band, K) selection -----------------------------------------
# Appended AFTER the kernel definitions on purpose: inserting lines above
# them would shift the source locations embedded in the serialized Mosaic
# kernels and cold-invalidate the compile cache (CLAUDE.md).

# Grids whose ping-pong state (2 x 9*h*w*4 B) leaves XLA room to promote it
# into VMEM next to the kernel's scoped allocation — the resident regime
# (experiments/d2q9-blocked-floor/residency.csv: 1,870 vs 311 GB/s copy).
# The cliff is MEASURED between 1280^2 (56 MB state, K=4 still wins) and
# 1408^2 (68 MB, K=4 drops 21% and K=8 takes over) —
# experiments/residency-cliff.
RESIDENT_STATE_CELLS = 1280 * 1280

# K=8's extra halo recompute (2*(K-1) = 14 ghost rows per band) only
# amortises at bands >= 32: measured K=8-vs-K=4 at the SAME band is
# +11% at band 32 x 8192 lanes (10,413 vs 9,390) but -10% at band 16
# (8,689 vs 9,696) — sweepk8.csv.
MIN_K8_BAND = 32

# Working-set budget that reproduces every measured K=8 per-width optimum
# (band 128/64/32 at widths 2048/4096/8192 — experiments/large-grid
# sweepk8.csv); the next band up at each width measured slower or failed
# Mosaic VMEM allocation outright (~84-89 MB working sets).
LARGE_GRID_VMEM_BUDGET = 50 * 1024 * 1024


def choose_config(h: int, w: int) -> tuple[int, int]:
    """(band, k_steps) for the fused kernel, from the measured optima.

    Resident grids (h*w <= 1280^2, ~56 MB state): K=4 at the choose_band
    default — the kernel is VPU-bound there and K=8 measured SLOWER
    (experiments/residency-cliff: 11,854 vs 10,524 at 1024^2). Larger
    grids can never be VMEM-resident and run against the ~330 GB/s
    shape-independent HBM floor (experiments/d2q9-blocked-floor), so
    deeper temporal blocking pays: K=8 wins at every measured
    non-resident size — 10,420-11,484 MLUPS at 1408^2..8192^2 vs
    8,601-10,216 for K=4 (residency-cliff + large-grid/sweepk8.csv) —
    PROVIDED its band is >= MIN_K8_BAND so the K-halo recompute stays
    amortised; on very wide grids where the 50 MB budget only affords a
    narrower band, fall back to K=4 (K=8 at band 16 measured -10%).
    """
    if h * w <= RESIDENT_STATE_CELLS:
        return choose_band(h, w), 4
    band_k8 = choose_band(h, w, vmem_budget=LARGE_GRID_VMEM_BUDGET)
    if band_k8 >= MIN_K8_BAND:
        return band_k8, 8
    return choose_band(h, w), 4


def choose_engine(h: int, w: int) -> str:
    """The measured best single-chip engine for this grid — currently
    'pallas-inplace' (ops/d2q9_pallas_inplace.py) at EVERY size.

    Engine family, each the measured champion of an earlier round
    (experiments/d2q9-overlap/results.csv, v5e):
    * 'pallas' (automatic Mosaic pipeline): rides XLA's VMEM residency
      promotion on <= 1280^2 grids; ~320 GB/s two-stream HBM floor above.
    * 'pallas-manual' (explicit double-buffered DMA): hides ~40% of the
      band copy behind compute — +2-5% on non-resident grids.
    * 'pallas-inplace' (aliased write-back): one HBM stream instead of
      two (~613 vs ~320 GB/s measured floor) and near-total DMA/compute
      overlap — 1024^2 12,114 MLUPS (auto 11,886), 2048^2 14,238 (auto
      11,377), 4096^2 15,186 (auto 11,606), 8192^2 14,369 (auto 10,548).

    Feasibility overrides the measured ranking on degenerate heights: the
    in-place pipeline needs >= 2 bands of a multiple-of-8 height (its
    epilogue drains bands nb-2 and nb-1), so h must be a multiple of 8
    and >= 16; a single-band h == 8 grid still runs on the two-stream
    'pallas' engine; anything not a multiple of 8 runs on 'jax'.
    """
    del w  # width never constrains engine choice; keep the signature
    if h % 8:
        return "jax"
    if h < 16:
        return "pallas"
    return "pallas-inplace"
