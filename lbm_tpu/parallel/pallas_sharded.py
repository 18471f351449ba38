"""Communication-avoiding multi-chip LBM: ghost-band exchange + local
K-step Pallas kernel.

The production distributed path. Each shard owns a contiguous block of the
grid over a ('ry','rx') mesh. Instead of exchanging one halo row/column every
step, each shard carries ghost bands — 8 rows (the kernel's halo-block
height) and, when columns are sharded, 128 columns (the TPU lane width) —
exchanged once per K steps with one `lax.ppermute` pair per mesh axis (the
2-wave scheme: columns first, then rows of the column-extended block so the
corners ride along). The fused K-step local kernel — by default the in-place
aliased engine (ops/d2q9_pallas_inplace, the measured-best single-chip
generation; local_engine='two-stream' keeps ops/d2q9_pallas.py) — then
advances the ghost-extended block K timesteps entirely in VMEM. Information
propagates one cell per step, so own cells stay exact for K <= 8 — the ghosts
absorb the wavefront and are refreshed at the next exchange. Sum|u| partials
exclude ghost cells (they duplicate neighbour cells) and are `psum`'d.

This combines the reference's two best ideas — the fused LbmTimeStepVertex
and its "implicit, compiler-scheduled, batched exchange beats chatty copies"
lesson (experiments/halo-exchange-approaches) — with classic
communication-avoiding stencil tiling: 1/K as many messages as per-step halo
exchange.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import Params
from ..ops import d2q9, d2q9_pallas, d2q9_pallas_inplace
from . import halo as halo_lib, mesh as mesh_lib

ROW, COL = mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS
GHOST = 8         # ghost band height = the kernel's halo-block height
GHOST_COLS = 128  # ghost band width = TPU lane width


def _local_stepk(local_engine: str):
    """The ghost-extended local kernel. 'inplace' (production default):
    the aliased one-HBM-stream kernel — the measured-best single-chip
    engine at every grid size (d2q9-overlap/results.csv) and bit-identical
    arithmetic to the two-stream kernel, so shard results are unchanged.
    'two-stream' keeps ops/d2q9_pallas.py (the parity oracle)."""
    if local_engine == "two-stream":
        return d2q9_pallas.stepk
    if local_engine == "inplace":
        return d2q9_pallas_inplace.stepk
    raise ValueError(
        f"local_engine must be 'inplace' or 'two-stream', "
        f"got {local_engine!r}")


def overlap_scheme(n_col_shards: int, shard_w: int,
                   scheme: str = "auto") -> str:
    """Resolve which decomposition make_overlap_chunk_fn uses.

    'row' (the 'auto' resolution): the row wave rides under the interior
    kernel; on a 2-D mesh the column wave stays exposed. 'full2d' hides
    BOTH waves under a ghost-free interior kernel, at the price of
    recomputing the W/E lane-width boundary strips (3*GHOST_COLS columns
    computed to yield GHOST_COLS valid) — the exchange model prices that
    recompute at ~1.9x the column wave it hides at v5e working figures
    (experiments/exchange-vs-compute, model2d-overlap-full2d rows), so
    'auto' never picks it; it stays selectable for deployments whose
    interconnect is >~2x slower per link. full2d also needs a column
    interior to hide the wave under: n_col_shards > 1 and
    shard_w >= 3*GHOST_COLS."""
    if scheme in ("auto", "row"):
        return "row"
    if scheme == "full2d":
        if n_col_shards <= 1:
            raise ValueError("scheme='full2d' needs a column-sharded mesh "
                             "(row meshes have no column wave to hide)")
        if shard_w < 3 * GHOST_COLS:
            raise ValueError(
                f"scheme='full2d' needs shard width >= {3 * GHOST_COLS} "
                f"(got {shard_w}): narrower shards have no column interior "
                "to hide the column wave under")
        return "full2d"
    raise ValueError(f"scheme must be 'auto'|'row'|'full2d', got {scheme!r}")


def make_row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D rows-only mesh (columns wrap locally on each shard)."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]).reshape(n, 1), (ROW, COL))


def make_mesh2d(rows: int, cols: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices[: rows * cols]).reshape(rows, cols), (ROW, COL))


def plan_rows(ny: int, n_row_shards: int) -> tuple[int, int]:
    """(shard_h, pad_rows) for the ghost-band path: shard heights must be a
    multiple of 8 (the Pallas kernel's sublane block), so uneven grids pad
    the LAST row-shard (the reference's remainder-row strategy,
    StructuredGridUtils.hpp:309-412, recast as pad-and-mask)."""
    h = -(-ny // n_row_shards)
    h = -(-h // 8) * 8
    # the last shard's VALID rows must cover a full ghost band: its top
    # GHOST valid rows are what the wrap-around south ghost is sliced from
    if ny - (n_row_shards - 1) * h < GHOST:
        raise ValueError(
            f"{ny} rows on {n_row_shards} row-shards: the last shard would "
            f"hold < {GHOST} valid rows (8-aligned shard height {h}); use "
            f"fewer row-shards or halo.simulate_sharded"
        )
    return h, n_row_shards * h - ny


def extended_mask(obstacle_mask: np.ndarray, n_row_shards: int,
                  n_col_shards: int = 1) -> np.ndarray:
    """Per-shard ghost-extended obstacle masks, stacked to
    (r*(h+16), c*(w+256)) so P('ry','rx') hands each shard its slab.

    Rows may be uneven: each extended local row maps to the REAL-periodic
    global row ((s*h + j - GHOST) mod ny); padding rows beyond the last
    shard's valid+ghost zone are marked as obstacles (excluded from Sum|u|,
    dynamics bounded by rebound)."""
    ny, nx = obstacle_mask.shape
    if nx % n_col_shards:
        raise ValueError(
            f"{nx} columns not divisible by {n_col_shards} column-shards "
            "(uneven support is rows-only on the ghost-band path; use a "
            "row mesh or halo.simulate_sharded for uneven columns)"
        )
    h, pad = plan_rows(ny, n_row_shards)
    w = nx // n_col_shards
    if n_col_shards > 1 and w < GHOST_COLS:
        raise ValueError(f"shard width {w} < ghost band {GHOST_COLS}")
    gc = GHOST_COLS if n_col_shards > 1 else 0
    row_blocks = []
    for s in range(n_row_shards):
        vh = h - pad if s == n_row_shards - 1 else h
        rows = (s * h - GHOST + np.arange(h + 2 * GHOST)) % ny
        col_blocks = []
        for t in range(n_col_shards):
            cols = np.arange(t * w - gc, t * w + w + gc) % nx
            blk = obstacle_mask[np.ix_(rows, cols)].copy()
            blk[2 * GHOST + vh:, :] = True  # dead padding rows
            col_blocks.append(blk)
        row_blocks.append(np.concatenate(col_blocks, axis=1))
    return np.concatenate(row_blocks, axis=0)


def make_chunk_fn(
    mesh: Mesh,
    *,
    k_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    ny: int,
    band: int | None = None,
    interpret: bool | None = None,
    local_engine: str = "inplace",
):
    """Returns a jittable fn advancing the sharded state K steps:
    (f (9,ny,nx) P(None,'ry','rx'), mask_ext P('ry','rx'))
    -> (f', tot_u (K,) replicated).
    local_engine picks the on-chip kernel (see _local_stepk)."""
    if not 1 <= k_steps <= GHOST:
        raise ValueError(f"k_steps must be in 1..{GHOST}")
    n_rows, n_cols = mesh.devices.shape
    h, pad_rows = plan_rows(ny, n_rows)
    gc = GHOST_COLS if n_cols > 1 else 0
    stepk = _local_stepk(local_engine)

    def local_chunk(f_loc, mask_ext_f):
        w = f_loc.shape[-1]
        # wave 1 (columns, only when column-sharded): 128-col edge blocks
        if n_cols > 1:
            ghost_w = halo_lib.ring_shift(f_loc[:, :, -GHOST_COLS:], COL, +1)
            ghost_e = halo_lib.ring_shift(f_loc[:, :, :GHOST_COLS], COL, -1)
            ext_c = jnp.concatenate([ghost_w, f_loc, ghost_e], axis=2)
        else:
            ext_c = f_loc
        # wave 2 (rows): 8-row edge blocks of the column-extended array,
        # so ghost corners ride along. With uneven rows, the torus wraps at
        # the last shard's valid edge: it sends its top valid GHOST rows and
        # writes the incoming north ghost there (a no-op position for
        # unpadded shards).
        is_last = jax.lax.axis_index(ROW) == n_rows - 1
        vh = h - jnp.where(is_last, pad_rows, 0)
        if pad_rows:
            w_ext = w + 2 * gc
            top_band = jax.lax.dynamic_slice(
                ext_c, (0, vh - GHOST, 0), (9, GHOST, w_ext))
        else:
            top_band = ext_c[:, -GHOST:, :]
        ghost_s = halo_lib.ring_shift(top_band, ROW, +1)
        ghost_n = halo_lib.ring_shift(ext_c[:, :GHOST, :], ROW, -1)
        ext = jnp.concatenate([ghost_s, ext_c, ghost_n], axis=1)
        if pad_rows:
            ext = jax.lax.dynamic_update_slice(ext, ghost_n, (0, vh + GHOST, 0))

        shard_row0 = jax.lax.axis_index(ROW).astype(jnp.int32) * h
        ext_new, tots = stepk(
            ext, mask_ext_f, k_steps=k_steps, omega=omega,
            accel_w1=accel_w1, accel_w2=accel_w2, accel_row=accel_row,
            band=band, interpret=interpret,
            row_offset=shard_row0 - GHOST,
            valid_rows=(GHOST, GHOST + vh),
            valid_cols=(gc, gc + w),
            global_ny=ny,
        )
        f_new = ext_new[:, GHOST : GHOST + h, gc : gc + w]
        return f_new, jax.lax.psum(tots, (ROW, COL))

    return jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(None, ROW, COL), P(ROW, COL)),
        out_specs=(P(None, ROW, COL), P()),
        # pallas_call's out_shape carries no varying-mesh-axis info
        check_vma=False,
    )


def make_overlap_chunk_fn(
    mesh: Mesh,
    *,
    k_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    ny: int,
    band: int | None = None,
    interpret: bool | None = None,
    local_engine: str = "inplace",
    scheme: str = "auto",
):
    """Row-exchange/compute-overlapped variant of make_chunk_fn — the 2-D
    instantiation of pallas_sharded_3d.make_overlap_chunk_fn (reference
    motivation: exchange grows to ~= compute at scale,
    /root/reference/experiments/gaussian-blur-scaling/exchange-vs-compute.csv
    and HaloRegionApproaches.cpp:359-519).

    A K-step update of owned row j reads rows [j-K, j+K], so owned rows
    [GHOST, h-GHOST) never read a row ghost: their kernel is issued
    straight after the ghost ppermutes with NO data dependence on them,
    letting XLA move the ghost bands over ICI while the bulk computes.
    Two 3*GHOST-row boundary kernels (one ghost band + 2 owned bands in,
    the GHOST edge rows out) run once the ghosts land.

    scheme='full2d' (opt-in, round-5 VERDICT #9; needs a 2-D mesh and
    shard width >= 3*GHOST_COLS) overlaps the COLUMN wave too: every
    first-hop ppermute (W/E column bands, S/N owned-row strips) is
    issued up front, ghost corners arrive as second-hop column shifts of
    the row strips (bit-identical to the fused 2-wave ghosts — ppermutes
    along different mesh axes commute with column concatenation), and
    FIVE kernels partition the owned cells: an interior kernel with no
    ghost dependence at all, W/E column-boundary kernels (one hop each),
    and S/N full-width row-boundary kernels (strips + corners). It is
    NOT the default ('auto' -> 'row'): the W/E kernels recompute
    3*GHOST_COLS lane-width columns to yield GHOST_COLS valid, and the
    exchange model prices that at ~1.9x the column wave it hides at v5e
    working figures (experiments/exchange-vs-compute,
    model2d-overlap-full2d rows) — see `overlap_scheme`.

    Either way physics is identical to the fused path: same per-cell
    arithmetic, and the kernels' Sum|u| valid windows partition the owned
    cells exactly — the STATE is bit-identical to the fused path (pinned
    by tests/test_pallas_sharded.py); the Sum|u| diagnostic is
    reduction-order-equal only (3 or 5 partial sums instead of one,
    f32-ulp differences).

    Requires evenly-sharded rows (no pad) and h >= 3*GHOST."""
    if not 1 <= k_steps <= GHOST:
        raise ValueError(f"k_steps must be in 1..{GHOST}")
    n_rows, n_cols = mesh.devices.shape
    h, pad_rows = plan_rows(ny, n_rows)
    if pad_rows:
        raise ValueError(
            "overlap=True supports evenly-sharded rows only (no pad); "
            f"ny={ny} on {n_rows} row-shards pads {pad_rows} rows — use "
            "the fused path")
    if h < 3 * GHOST:
        raise ValueError(
            f"overlap=True needs >= {3 * GHOST} rows per shard (h={h}): "
            "thinner shards have no ghost-independent interior to overlap")
    gc = GHOST_COLS if n_cols > 1 else 0
    stepk = _local_stepk(local_engine)
    g = GHOST

    def full2d_chunk(f_loc, mask_ext_f):
        """Both-wave overlap: interior kernel depends on no ghosts."""
        w = f_loc.shape[-1]
        gcw = GHOST_COLS
        shard_row0 = jax.lax.axis_index(ROW).astype(jnp.int32) * h
        kw = dict(k_steps=k_steps, omega=omega, accel_w1=accel_w1,
                  accel_w2=accel_w2, accel_row=accel_row,
                  interpret=interpret, global_ny=ny)
        # 1. every first-hop ghost exchange, mutually independent and
        # independent of the interior kernel
        ghost_w = halo_lib.ring_shift(f_loc[:, :, -gcw:], COL, +1)
        ghost_e = halo_lib.ring_shift(f_loc[:, :, :gcw], COL, -1)
        ghost_s = halo_lib.ring_shift(f_loc[:, -g:, :], ROW, +1)
        ghost_n = halo_lib.ring_shift(f_loc[:, :g, :], ROW, -1)
        # ghost corners: second-hop COLUMN shifts of the row strips.
        # ring_shift(ghost_s[..., -gcw:], COL, +1) IS the fused path's
        # ring_shift(ghost_w[:, -g:], ROW, +1) corner — the two hops
        # commute — so every ghost cell is bitwise the fused one.
        sw = halo_lib.ring_shift(ghost_s[:, :, -gcw:], COL, +1)
        se = halo_lib.ring_shift(ghost_s[:, :, :gcw], COL, -1)
        nw = halo_lib.ring_shift(ghost_n[:, :, -gcw:], COL, +1)
        ne = halo_lib.ring_shift(ghost_n[:, :, :gcw], COL, -1)

        # 2. interior kernel: owned block only. Cells within K of the
        # block edge wrap around it (wrong physics) and are discarded.
        int_new, t_i = stepk(
            f_loc, mask_ext_f[g : g + h, gcw : gcw + w], band=band,
            row_offset=shard_row0, valid_rows=(g, h - g),
            valid_cols=(gcw, w - gcw), **kw)

        # 3. W/E column-boundary kernels: ghost band + 2 owned bands in,
        # the GHOST_COLS edge columns (interior rows only) out
        west_in = jnp.concatenate([ghost_w, f_loc[:, :, : 2 * gcw]],
                                  axis=2)
        w_new, t_w = stepk(
            west_in, mask_ext_f[g : g + h, : 3 * gcw], band=band,
            row_offset=shard_row0, valid_rows=(g, h - g),
            valid_cols=(gcw, 2 * gcw), **kw)
        east_in = jnp.concatenate([f_loc[:, :, w - 2 * gcw :], ghost_e],
                                  axis=2)
        e_new, t_e = stepk(
            east_in, mask_ext_f[g : g + h, w - gcw : w + 2 * gcw],
            band=band, row_offset=shard_row0, valid_rows=(g, h - g),
            valid_cols=(gcw, 2 * gcw), **kw)

        # 4. S/N row-boundary kernels: full owned width incl. the corner
        # cells, so they carry the column-extended ghost strips
        top_ext = jnp.concatenate(
            [ghost_w[:, : 2 * g], f_loc[:, : 2 * g], ghost_e[:, : 2 * g]],
            axis=2)
        south_in = jnp.concatenate(
            [jnp.concatenate([sw, ghost_s, se], axis=2), top_ext], axis=1)
        s_new, t_s = stepk(
            south_in, mask_ext_f[: 3 * g],
            row_offset=shard_row0 - g, valid_rows=(g, 2 * g),
            valid_cols=(gcw, gcw + w), **kw)
        bot_ext = jnp.concatenate(
            [ghost_w[:, h - 2 * g :], f_loc[:, h - 2 * g :],
             ghost_e[:, h - 2 * g :]], axis=2)
        north_in = jnp.concatenate(
            [bot_ext, jnp.concatenate([nw, ghost_n, ne], axis=2)], axis=1)
        n_new, t_n = stepk(
            north_in, mask_ext_f[h - g : h + 2 * g],
            row_offset=shard_row0 + h - 2 * g, valid_rows=(g, 2 * g),
            valid_cols=(gcw, gcw + w), **kw)

        # 5. stitch the five disjoint valid regions back together
        mid = jnp.concatenate(
            [w_new[:, g : h - g, gcw : 2 * gcw],
             int_new[:, g : h - g, gcw : w - gcw],
             e_new[:, g : h - g, gcw : 2 * gcw]], axis=2)
        f_new = jnp.concatenate(
            [s_new[:, g : 2 * g, gcw : gcw + w], mid,
             n_new[:, g : 2 * g, gcw : gcw + w]], axis=1)
        return f_new, jax.lax.psum(t_i + t_w + t_e + t_s + t_n,
                                   (ROW, COL))

    def local_chunk(f_loc, mask_ext_f):
        w = f_loc.shape[-1]
        if overlap_scheme(n_cols, w, scheme) == "full2d":
            return full2d_chunk(f_loc, mask_ext_f)
        if n_cols > 1:
            ghost_w = halo_lib.ring_shift(f_loc[:, :, -GHOST_COLS:], COL, +1)
            ghost_e = halo_lib.ring_shift(f_loc[:, :, :GHOST_COLS], COL, -1)
            ext_c = jnp.concatenate([ghost_w, f_loc, ghost_e], axis=2)
        else:
            ext_c = f_loc
        # mask_ext_f covers [row ghost | owned | row ghost] x column-ext:
        # strip the row-ghost bands off for the interior kernel
        mask_own = mask_ext_f[g : g + h]

        shard_row0 = jax.lax.axis_index(ROW).astype(jnp.int32) * h
        kw = dict(k_steps=k_steps, omega=omega, accel_w1=accel_w1,
                  accel_w2=accel_w2, accel_row=accel_row,
                  interpret=interpret, global_ny=ny,
                  valid_cols=(gc, gc + w))

        # 1. issue the row-ghost exchange...
        ghost_s = halo_lib.ring_shift(ext_c[:, -g:, :], ROW, +1)
        ghost_n = halo_lib.ring_shift(ext_c[:, :g, :], ROW, -1)

        # 2. ...then the interior kernel, which depends only on ext_c.
        # Rows outside [GHOST, h-GHOST) wrap around the shard (wrong
        # physics) and are discarded/excluded from the Sum.
        int_new, t_i = stepk(
            ext_c, mask_own, band=band,
            row_offset=shard_row0, valid_rows=(g, h - g), **kw)

        # 3. boundary kernels: one ghost band + two owned bands -> the
        # GHOST edge rows whose stencil reaches the ghosts
        south_in = jnp.concatenate([ghost_s, ext_c[:, : 2 * g, :]], axis=1)
        s_new, t_s = stepk(
            south_in, mask_ext_f[: 3 * g],
            row_offset=shard_row0 - g, valid_rows=(g, 2 * g), **kw)
        north_in = jnp.concatenate([ext_c[:, h - 2 * g :, :], ghost_n],
                                   axis=1)
        n_new, t_n = stepk(
            north_in, mask_ext_f[g + h - 2 * g : g + h + g],
            row_offset=shard_row0 + h - 2 * g, valid_rows=(g, 2 * g), **kw)

        f_new = jnp.concatenate(
            [s_new[:, g : 2 * g], int_new[:, g : h - g],
             n_new[:, g : 2 * g]], axis=1)[:, :, gc : gc + w]
        return f_new, jax.lax.psum(t_i + t_s + t_n, (ROW, COL))

    return jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(None, ROW, COL), P(ROW, COL)),
        out_specs=(P(None, ROW, COL), P()),
        check_vma=False,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "k_steps", "omega", "accel_w1",
                     "accel_w2", "accel_row", "ny", "band", "interpret",
                     "local_engine", "overlap", "scheme"),
)
def run(
    f: jax.Array,
    mask_ext_f: jax.Array,
    *,
    mesh: Mesh,
    num_steps: int,
    k_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    accel_row: int,
    ny: int,
    band: int | None = None,
    interpret: bool | None = None,
    local_engine: str = "inplace",
    overlap: bool = False,
    scheme: str = "auto",
):
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")
    kw = {} if not overlap else {"scheme": scheme}
    make = make_overlap_chunk_fn if overlap else make_chunk_fn
    chunk = make(
        mesh, k_steps=k_steps, omega=omega, accel_w1=accel_w1,
        accel_w2=accel_w2, accel_row=accel_row, ny=ny, band=band,
        interpret=interpret, local_engine=local_engine, **kw,
    )

    def body(carry, _):
        f_new, tots = chunk(carry, mask_ext_f)
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)


def prepare(
    params: Params,
    f,
    obstacle_mask,
    mesh: Mesh,
    *,
    first_accelerate: bool = True,
):
    """Lay the state out for run(): pad-and-mask uneven rows, device_put,
    one-off guarded acceleration (skip with first_accelerate=False when
    resuming a checkpoint), and build the ghost-extended obstacle mask.
    Returns (f_sh, mask_ext_f, pad_rows)."""
    n_rows, n_cols = mesh.devices.shape
    aw = d2q9.AccelWeights.from_params(params)
    accel_row = params.ny - 2
    ny = params.ny

    obstacle_np = np.asarray(obstacle_mask)
    _, pad = plan_rows(ny, n_rows)
    f_np = np.asarray(f)
    mask_padded = obstacle_np
    if pad:
        # pad-and-mask: equilibrium-filled dead rows in the last shard,
        # masked as obstacles (shared helper with halo.simulate_sharded)
        f_np, mask_padded = mesh_lib.pad_grid(params, f_np, obstacle_np,
                                              pad, 0)

    f = jax.device_put(jnp.asarray(f_np), NamedSharding(mesh, P(None, ROW, COL)))
    if first_accelerate:
        obstacle_sh = jax.device_put(
            jnp.asarray(mask_padded), NamedSharding(mesh, P(ROW, COL))
        )
        f = d2q9.first_accelerate(
            f, obstacle_sh, accel_row=accel_row, accel_w1=aw.w1, accel_w2=aw.w2
        )
    mask_ext_f = jax.device_put(
        jnp.asarray(extended_mask(obstacle_np, n_rows, n_cols), f.dtype),
        NamedSharding(mesh, P(ROW, COL)),
    )
    return f, mask_ext_f, pad


def simulate(
    params: Params,
    f,
    obstacle_mask,
    mesh: Mesh | None = None,
    *,
    k_steps: int = 4,
    band: int | None = None,
    local_engine: str = "inplace",
    overlap: bool = False,
    scheme: str = "auto",
):
    """Full reference-semantics distributed simulation on the
    ghost-band + local-Pallas path. Same contract as d2q9.simulate.
    local_engine='inplace' (default) runs the aliased one-stream kernel
    on each shard; 'two-stream' keeps the original kernel (oracle).
    overlap=True rides the row-ghost ppermutes under the interior kernel
    (make_overlap_chunk_fn; even row sharding, >= 24 rows/shard);
    scheme='full2d' additionally hides the column wave (see
    overlap_scheme for why that is opt-in)."""
    if mesh is None:
        mesh = make_row_mesh()
    aw = d2q9.AccelWeights.from_params(params)
    accel_row = params.ny - 2
    ny, nx = params.ny, params.nx

    obstacle_np = np.asarray(obstacle_mask)
    f, mask_ext_f, pad = prepare(params, f, obstacle_mask, mesh)
    f_final, tot_u = run(
        f, mask_ext_f, mesh=mesh, num_steps=params.max_iters,
        k_steps=k_steps, omega=params.omega, accel_w1=aw.w1, accel_w2=aw.w2,
        accel_row=accel_row, ny=ny, band=band, local_engine=local_engine,
        overlap=overlap, scheme=scheme,
    )
    if pad:
        f_final = f_final[:, :ny, :]
    num_free = ny * nx - int(obstacle_np.sum())
    return f_final, tot_u / jnp.asarray(num_free, f.dtype)
