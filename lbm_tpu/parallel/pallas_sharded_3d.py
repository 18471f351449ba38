"""Communication-avoiding multi-chip D3Q19: ghost-plane exchange + local
K-step Pallas kernel.

The 3-D production distributed path — the z-axis instantiation of the 2-D
scheme in pallas_sharded.py. Each shard owns a contiguous slab of z-planes
over a 1-D ('ry',) mesh row axis; y and x stay whole on every shard (their
periodic wrap lives inside the kernel's rolls). Shards carry K ghost planes
per side, exchanged once per K steps with one `lax.ppermute` pair; the fused
K-step local kernel — by default the in-place aliased family
(ops/d3q19_pallas_inplace[_blocked], ~2x the two-stream kernel single-chip;
local_engine='two-stream' keeps ops/d3q19_pallas.py as the parity oracle)
— then advances the ghost-extended
slab K timesteps entirely on-chip. Information propagates one plane per
step, so owned planes stay exact for K <= ghost depth. Sum|u| partials
exclude ghost planes (they duplicate neighbour planes) and are `psum`'d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import (d3q19, d3q19_pallas, d3q19_pallas_inplace,
                   d3q19_pallas_inplace_blocked)
from . import halo as halo_lib, mesh as mesh_lib

ROW = mesh_lib.ROW_AXIS
COL = mesh_lib.COL_AXIS
GHOST_Y = 8  # y ghost band = the kernels' 8-row sublane halo granularity


def _local_stepk(local_engine: str, k_steps: int, bz):
    """The ghost-extended local kernel as a stepk-callable.

    'inplace' (production default): the aliased one-HBM-stream family —
    slab or (z,y)-blocked picked per extended-shape VMEM feasibility at
    trace time (6,386 vs 3,253 MLUPS single-chip at the bench shape,
    lbm3d-perf/inplace.csv; bit-identical arithmetic to the two-stream
    kernel, so shard results are unchanged). 'two-stream' keeps the
    original d3q19_pallas kernel (the parity oracle, and the only
    K-even option K | bz supports). An explicit bz overrides the slab
    pick; the blocked route always uses its calibrated config."""
    if local_engine == "two-stream":
        return functools.partial(d3q19_pallas.stepk, bz=bz)
    if local_engine != "inplace":
        raise ValueError(
            f"local_engine must be 'inplace' or 'two-stream', "
            f"got {local_engine!r}")

    def stepk(ext, mask_ext_f, **kw):
        _, nz_e, ny, nx = ext.shape
        try:
            kind, pbz, pby = d3q19_pallas_inplace_blocked.pick_engine(
                nz_e, ny, nx, k_steps)
        except ValueError:
            # no feasible in-place config for this ghost-extended shard
            # shape (e.g. prime extended nz at the requested K) — fall
            # back to the two-stream kernel: bit-identical arithmetic,
            # so shard results are unchanged, only slower
            return d3q19_pallas.stepk(ext, mask_ext_f, bz=bz, **kw)
        if kind == "slab":
            return d3q19_pallas_inplace.stepk(
                ext, mask_ext_f, bz=pbz if bz is None else bz, **kw)
        return d3q19_pallas_inplace_blocked.stepk(
            ext, mask_ext_f, bz=pbz, by=pby, **kw)

    return stepk


def make_z_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]).reshape(n), (ROW,))


def plan_planes(nz: int, n_shards: int, ghost: int) -> tuple[int, int]:
    """(shard_depth, pad_planes) for the ghost-plane path: shard depths must
    be a multiple of the ghost depth (the kernel's K | nz constraint), so
    uneven nz pads the LAST z-shard — the z-axis instantiation of the 2-D
    pad-and-mask remainder strategy (pallas_sharded.plan_rows; reference
    remainder rows: StructuredGridUtils.hpp:309-412)."""
    h = -(-nz // n_shards)
    h = -(-h // ghost) * ghost
    if nz - (n_shards - 1) * h < ghost:
        raise ValueError(
            f"{nz} planes on {n_shards} z-shards: the last shard would hold "
            f"< {ghost} valid planes (ghost-aligned depth {h}); use fewer "
            "z-shards or k_steps")
    return h, n_shards * h - nz


def extended_mask(obstacle_mask: np.ndarray, n_shards: int, ghost: int) -> np.ndarray:
    """Per-shard ghost-extended obstacle masks stacked to (r*(h+2g), ny, nx).

    Uneven nz: each extended local plane maps to the REAL-periodic global
    plane ((s*h + j - g) mod nz); the last shard's planes beyond its
    valid+north-ghost zone are dead padding, marked as obstacles (excluded
    from Sum|u|, dynamics bounded by rebound)."""
    nz, ny, nx = obstacle_mask.shape
    h, _pad = plan_planes(nz, n_shards, ghost)
    blocks = []
    for s in range(n_shards):
        vh = min(h, nz - s * h)
        planes = (s * h - ghost + np.arange(h + 2 * ghost)) % nz
        blk = obstacle_mask[planes].copy()
        blk[2 * ghost + vh:] = True  # dead padding planes
        blocks.append(blk)
    return np.concatenate(blocks, axis=0)


def make_chunk_fn(
    mesh: Mesh,
    *,
    k_steps: int,
    omega: float,
    density: float,
    accel: float,
    accel_plane: int,
    nz: int,
    bz: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
    overlap: bool = False,
    local_engine: str = "inplace",
):
    """Jittable fn advancing the z-sharded state K steps:
    (f (19,nz,ny,nx) P(None,'ry',None,None), mask_ext P('ry',None,None))
    -> (f', tot_u (K,) replicated).

    overlap=True splits the K-step update so the ghost ppermute can ride
    under the bulk of the compute (see make_overlap_chunk_fn).
    local_engine picks the on-chip kernel (see _local_stepk)."""
    (n_shards,) = mesh.devices.shape
    g = k_steps  # ghost depth = steps absorbed between exchanges
    h, pad = plan_planes(nz, n_shards, g)
    if overlap:
        return make_overlap_chunk_fn(
            mesh, k_steps=k_steps, omega=omega, density=density, accel=accel,
            accel_plane=accel_plane, nz=nz, bz=bz, interpret=interpret,
            vmem_limit=vmem_limit, local_engine=local_engine)
    stepk = _local_stepk(local_engine, k_steps, bz)

    def local_chunk(f_loc, mask_ext_f):
        _, _, ny, nx = f_loc.shape
        # With uneven nz, the torus wraps at the last shard's valid edge:
        # it sends its top valid g planes and the incoming north ghost is
        # written right after the valid planes (a no-op position for
        # unpadded shards) — the z instantiation of the 2-D scheme.
        is_last = jax.lax.axis_index(ROW) == n_shards - 1
        vh = h - jnp.where(is_last, pad, 0)
        if pad:
            top_band = jax.lax.dynamic_slice(
                f_loc, (0, vh - g, 0, 0), (19, g, ny, nx))
        else:
            top_band = f_loc[:, -g:]
        ghost_s = halo_lib.ring_shift(top_band, ROW, +1)
        ghost_n = halo_lib.ring_shift(f_loc[:, :g], ROW, -1)
        ext = jnp.concatenate([ghost_s, f_loc, ghost_n], axis=1)
        if pad:
            ext = jax.lax.dynamic_update_slice(ext, ghost_n, (0, vh + g, 0, 0))

        shard_z0 = jax.lax.axis_index(ROW).astype(jnp.int32) * h
        ext_new, tots = stepk(
            ext, mask_ext_f, k_steps=k_steps, omega=omega, density=density,
            accel=accel, accel_plane=accel_plane, interpret=interpret,
            vmem_limit=vmem_limit,
            plane_offset=shard_z0 - g,
            valid_planes=(g, g + vh),
            global_nz=nz,
        )
        f_new = ext_new[:, g : g + h]
        return f_new, jax.lax.psum(tots, ROW)

    return jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(None, ROW, None, None), P(ROW, None, None)),
        out_specs=(P(None, ROW, None, None), P()),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )


def make_overlap_chunk_fn(
    mesh: Mesh,
    *,
    k_steps: int,
    omega: float,
    density: float,
    accel: float,
    accel_plane: int,
    nz: int,
    bz: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
    local_engine: str = "inplace",
):
    """Communication/compute-overlapped variant of make_chunk_fn.

    A K-step update of owned plane j reads planes [j-K, j+K], so owned
    planes [K, h-K) never read a ghost: their kernel is issued straight
    after the ghost ppermutes with NO data dependence on them, letting
    XLA's async collectives move the ghost planes over ICI while the
    interior (the bulk: h-2K of h planes) computes. Two small 3K-plane
    boundary kernels — each K ghost + 2K owned planes in, the K edge
    planes out — run once the ghosts land. Physics is identical to the
    fused path (same per-cell arithmetic; Sum|u| valid ranges partition
    the owned planes exactly): tested equal on the CPU mesh. The
    exchange-vs-compute model3d rows motivate this: at 16 planes/shard
    the un-overlapped exchange is ~20% of the step.

    Requires even sharding (no pad) and h >= 3K; `run(overlap=True)`
    falls back is not provided — callers choose explicitly.
    """
    (n_shards,) = mesh.devices.shape
    g = k_steps
    h, pad = plan_planes(nz, n_shards, g)
    if pad:
        raise ValueError(
            "overlap=True supports evenly-sharded nz only (no pad planes); "
            f"nz={nz} on {n_shards} shards pads {pad} planes — use the "
            "fused path")
    if h < 3 * g:
        raise ValueError(
            f"overlap=True needs >= 3*K planes per shard (h={h}, K={g}): "
            "thinner shards have no ghost-independent interior to overlap")

    kw = dict(k_steps=k_steps, omega=omega, density=density, accel=accel,
              accel_plane=accel_plane, interpret=interpret,
              vmem_limit=vmem_limit, global_nz=nz)
    step_int = _local_stepk(local_engine, k_steps, bz)
    # boundary kernels: bz auto-chosen — the caller's interior bz need
    # not divide the 3K-plane slabs
    step_bnd = _local_stepk(local_engine, k_steps, None)

    def local_chunk(f_loc, mask_ext_f):
        _, _, ny, nx = f_loc.shape
        shard_z0 = jax.lax.axis_index(ROW).astype(jnp.int32) * h

        # 1. issue the ghost exchange first...
        ghost_s = halo_lib.ring_shift(f_loc[:, -g:], ROW, +1)
        ghost_n = halo_lib.ring_shift(f_loc[:, :g], ROW, -1)

        # 2. ...then the interior kernel, which depends only on f_loc:
        # XLA may overlap it with the ppermutes. Planes outside [K, h-K)
        # wrap around the slab (wrong physics) and are discarded/excluded.
        int_new, t_i = step_int(
            f_loc, mask_ext_f[g : g + h], plane_offset=shard_z0,
            valid_planes=(g, h - g), **kw)

        # 3. boundary kernels: K ghost + 2K owned planes -> the K edge
        # planes whose stencil reaches the ghosts
        south_in = jnp.concatenate([ghost_s, f_loc[:, : 2 * g]], axis=1)
        s_new, t_s = step_bnd(
            south_in, mask_ext_f[: 3 * g], plane_offset=shard_z0 - g,
            valid_planes=(g, 2 * g), **kw)
        north_in = jnp.concatenate([f_loc[:, h - 2 * g :], ghost_n], axis=1)
        n_new, t_n = step_bnd(
            north_in, mask_ext_f[g + h - 2 * g : g + h + g],
            plane_offset=shard_z0 + h - 2 * g,
            valid_planes=(g, 2 * g), **kw)

        f_new = jnp.concatenate(
            [s_new[:, g : 2 * g], int_new[:, g : h - g],
             n_new[:, g : 2 * g]], axis=1)
        return f_new, jax.lax.psum(t_i + t_s + t_n, ROW)

    return jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(None, ROW, None, None), P(ROW, None, None)),
        out_specs=(P(None, ROW, None, None), P()),
        check_vma=False,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "k_steps", "omega", "density",
                     "accel", "accel_plane", "nz", "bz", "interpret",
                     "vmem_limit", "overlap", "local_engine"),
)
def run(
    f: jax.Array,
    mask_ext_f: jax.Array,
    *,
    mesh: Mesh,
    num_steps: int,
    k_steps: int,
    omega: float,
    density: float,
    accel: float,
    accel_plane: int,
    nz: int,
    bz: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
    overlap: bool = False,
    local_engine: str = "inplace",
):
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")
    chunk = make_chunk_fn(
        mesh, k_steps=k_steps, omega=omega, density=density, accel=accel,
        accel_plane=accel_plane, nz=nz, bz=bz, interpret=interpret,
        vmem_limit=vmem_limit, overlap=overlap, local_engine=local_engine,
    )

    def body(carry, _):
        f_new, tots = chunk(carry, mask_ext_f)
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)


def simulate(
    nz: int, ny: int, nx: int, *,
    num_steps: int,
    omega: float = 1.85,
    density: float = 0.1,
    accel: float = 0.005,
    obstacle_mask=None,
    dtype=np.float32,
    mesh: Mesh | None = None,
    k_steps: int = 2,
    bz: int | None = None,
    overlap: bool = False,
    local_engine: str = "inplace",
):
    """Full 3-D distributed simulation on the ghost-plane + local-Pallas
    path. Same contract as d3q19.simulate. overlap=True uses the
    communication/compute-overlapped chunk (even sharding only).
    local_engine='inplace' (default) runs the aliased one-stream kernel
    family on each shard — bit-identical arithmetic to 'two-stream'
    (the original kernel, kept as the parity oracle)."""
    if mesh is None:
        mesh = make_z_mesh()
    (n_shards,) = mesh.devices.shape
    if obstacle_mask is None:
        obstacle_mask = np.zeros((nz, ny, nx), bool)
        obstacle_mask[0] = True
        obstacle_mask[-1] = True
    obstacle_np = np.asarray(obstacle_mask)

    _h, pad = plan_planes(nz, n_shards, k_steps)
    f_np = np.asarray(d3q19.initial_distributions(nz, ny, nx, density, dtype))
    if pad:
        # pad-and-mask: equilibrium-filled dead planes appended to the last
        # shard, masked as obstacles in extended_mask
        f_np = np.concatenate(
            [f_np,
             np.asarray(d3q19.initial_distributions(pad, ny, nx, density,
                                                    dtype))], axis=1)
    f = jax.device_put(
        jnp.asarray(f_np), NamedSharding(mesh, P(None, ROW, None, None)),
    )
    mask_ext_f = jax.device_put(
        jnp.asarray(extended_mask(obstacle_np, n_shards, k_steps), f.dtype),
        NamedSharding(mesh, P(ROW, None, None)),
    )
    f_final, tot = run(
        f, mask_ext_f, mesh=mesh, num_steps=num_steps, k_steps=k_steps,
        omega=omega, density=density, accel=accel, accel_plane=nz - 2,
        nz=nz, bz=bz, overlap=overlap, local_engine=local_engine,
    )
    if pad:
        f_final = f_final[:, :nz]
    num_free = nz * ny * nx - int(obstacle_np.sum())
    return f_final, tot / jnp.asarray(num_free, f.dtype)


# ---------------------------------------------------------------------------
# (z, y) 2-axis mesh decomposition.
#
# The 3-D instantiation of the reference's rows x cols domain partitioner
# (grids::partitionForIpus, StructuredGridUtils.hpp:472-561) and of this
# repo's 2-D 2-wave scheme (pallas_sharded.make_chunk_fn): shard BOTH the
# z-planes (mesh axis 'ry') and the y-rows (mesh axis 'rx'). Wave 1
# exchanges 8-row y ghost bands along 'rx'; wave 2 exchanges K-plane z
# ghosts of the y-EXTENDED block along 'ry', so the (z, y) ghost corners
# ride along. Motivation beyond parity: on plane-heavy shapes z-only
# sharding goes kernel-infeasible at scale (e.g. 32x256x256 on 8 shards
# leaves 4-plane z-shards that cannot carry a K=3 ghost), and a 2-axis
# split halves the boundary area per device.
# ---------------------------------------------------------------------------


def make_zy_mesh(n_z: int, n_y: int, devices=None) -> Mesh:
    """(z, y) device mesh: axis 'ry' shards z-planes, 'rx' shards y-rows
    (reusing the repo-wide mesh axis names so halo_lib.ring_shift and the
    2-D tooling carry over)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices[: n_z * n_y]).reshape(n_z, n_y),
                (ROW, COL))


def plan_rows_y(ny: int, n_y_shards: int) -> tuple[int, int]:
    """(shard_rows, pad_rows) for the y axis: shard heights must be a
    multiple of 8 (the kernels' sublane halo block), uneven ny pads the
    LAST y-shard — pad-and-mask exactly as plan_planes does for z."""
    h = -(-ny // n_y_shards)
    h = -(-h // GHOST_Y) * GHOST_Y
    if ny - (n_y_shards - 1) * h < GHOST_Y:
        raise ValueError(
            f"{ny} rows on {n_y_shards} y-shards: the last shard would hold "
            f"< {GHOST_Y} valid rows (8-aligned shard height {h}); use "
            "fewer y-shards")
    return h, n_y_shards * h - ny


def extended_mask_zy(obstacle_mask: np.ndarray, n_z: int, n_y: int,
                     ghost: int) -> np.ndarray:
    """Per-shard (z, y) ghost-extended obstacle masks stacked to
    (n_z*(hz+2g), n_y*(hy+16), nx) so P('ry','rx',None) hands each shard
    its block. Each extended cell maps to the REAL-periodic global cell;
    dead padding planes/rows (uneven nz/ny) are marked as obstacles
    (excluded from Sum|u|, dynamics bounded by rebound)."""
    nz, ny, nx = obstacle_mask.shape
    hz, _ = plan_planes(nz, n_z, ghost)
    hy, _ = plan_rows_y(ny, n_y)
    z_blocks = []
    for s in range(n_z):
        vhz = min(hz, nz - s * hz)
        planes = (s * hz - ghost + np.arange(hz + 2 * ghost)) % nz
        y_blocks = []
        for t in range(n_y):
            vhy = min(hy, ny - t * hy)
            rows = (t * hy - GHOST_Y + np.arange(hy + 2 * GHOST_Y)) % ny
            blk = obstacle_mask[np.ix_(planes, rows)].copy()
            blk[2 * ghost + vhz:, :] = True   # dead padding planes
            blk[:, 2 * GHOST_Y + vhy:] = True  # dead padding rows
            y_blocks.append(blk)
        z_blocks.append(np.concatenate(y_blocks, axis=1))
    return np.concatenate(z_blocks, axis=0)


def make_zy_chunk_fn(
    mesh: Mesh,
    *,
    k_steps: int,
    omega: float,
    density: float,
    accel: float,
    accel_plane: int,
    nz: int,
    ny: int,
    bz: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
    local_engine: str = "inplace",
):
    """Jittable fn advancing the (z, y)-sharded state K steps:
    (f (19,nz,ny,nx) P(None,'ry','rx',None), mask_ext P('ry','rx',None))
    -> (f', tot_u (K,) replicated).

    Wave 1: 8-row y ghost bands along 'rx'. Wave 2: K-plane z ghosts of
    the y-extended block along 'ry' (corners ride along — the 2-D 2-wave
    corner scheme, halo.exchange_halos_2wave). Both axes support uneven
    grids via pad-and-mask with the torus wrapping at the last shard's
    valid edge. The local kernel is the in-place aliased family with the
    usual two-stream fallback (_local_stepk); its Sum|u| windows exclude
    BOTH ghost planes and ghost rows (valid_planes/valid_rows)."""
    if k_steps > GHOST_Y:
        raise ValueError(
            f"k_steps must be <= {GHOST_Y} (the y ghost band absorbs one "
            "row of wavefront per step)")
    n_z, n_y = mesh.devices.shape
    g = k_steps
    hz, pad_z = plan_planes(nz, n_z, g)
    hy, pad_y = plan_rows_y(ny, n_y)
    stepk = _local_stepk(local_engine, k_steps, bz)

    def local_chunk(f_loc, mask_ext_f):
        _, _, _, nx = f_loc.shape

        # wave 1 (y rows along 'rx'): 8-row edge bands. With uneven ny the
        # torus wraps at the last shard's valid edge: it sends its top
        # valid 8 rows and the incoming east ghost is written right after
        # the valid rows (a no-op position for unpadded shards).
        is_last_y = jax.lax.axis_index(COL) == n_y - 1
        vhy = hy - jnp.where(is_last_y, pad_y, 0)
        if pad_y:
            east_band = jax.lax.dynamic_slice(
                f_loc, (0, 0, vhy - GHOST_Y, 0), (19, hz, GHOST_Y, nx))
        else:
            east_band = f_loc[:, :, -GHOST_Y:]
        ghost_w = halo_lib.ring_shift(east_band, COL, +1)
        ghost_e = halo_lib.ring_shift(f_loc[:, :, :GHOST_Y], COL, -1)
        ext_y = jnp.concatenate([ghost_w, f_loc, ghost_e], axis=2)
        if pad_y:
            ext_y = jax.lax.dynamic_update_slice(
                ext_y, ghost_e, (0, 0, vhy + GHOST_Y, 0))

        # wave 2 (z planes along 'ry') on the y-extended block: the K-plane
        # ghosts carry the y ghosts of the z-neighbour — the corners.
        is_last_z = jax.lax.axis_index(ROW) == n_z - 1
        vhz = hz - jnp.where(is_last_z, pad_z, 0)
        ny_ext = hy + 2 * GHOST_Y
        if pad_z:
            top_band = jax.lax.dynamic_slice(
                ext_y, (0, vhz - g, 0, 0), (19, g, ny_ext, nx))
        else:
            top_band = ext_y[:, -g:]
        ghost_s = halo_lib.ring_shift(top_band, ROW, +1)
        ghost_n = halo_lib.ring_shift(ext_y[:, :g], ROW, -1)
        ext = jnp.concatenate([ghost_s, ext_y, ghost_n], axis=1)
        if pad_z:
            ext = jax.lax.dynamic_update_slice(
                ext, ghost_n, (0, vhz + g, 0, 0))

        shard_z0 = jax.lax.axis_index(ROW).astype(jnp.int32) * hz
        ext_new, tots = stepk(
            ext, mask_ext_f, k_steps=k_steps, omega=omega, density=density,
            accel=accel, accel_plane=accel_plane, interpret=interpret,
            vmem_limit=vmem_limit,
            plane_offset=shard_z0 - g,
            valid_planes=(g, g + vhz),
            valid_rows=(GHOST_Y, GHOST_Y + vhy),
            global_nz=nz,
        )
        f_new = ext_new[:, g : g + hz, GHOST_Y : GHOST_Y + hy]
        return f_new, jax.lax.psum(tots, (ROW, COL))

    return jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(None, ROW, COL, None), P(ROW, COL, None)),
        out_specs=(P(None, ROW, COL, None), P()),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "k_steps", "omega", "density",
                     "accel", "accel_plane", "nz", "ny", "bz", "interpret",
                     "vmem_limit", "local_engine"),
)
def run_zy(
    f: jax.Array,
    mask_ext_f: jax.Array,
    *,
    mesh: Mesh,
    num_steps: int,
    k_steps: int,
    omega: float,
    density: float,
    accel: float,
    accel_plane: int,
    nz: int,
    ny: int,
    bz: int | None = None,
    interpret: bool | None = None,
    vmem_limit: int | None = None,
    local_engine: str = "inplace",
):
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")
    chunk = make_zy_chunk_fn(
        mesh, k_steps=k_steps, omega=omega, density=density, accel=accel,
        accel_plane=accel_plane, nz=nz, ny=ny, bz=bz, interpret=interpret,
        vmem_limit=vmem_limit, local_engine=local_engine,
    )

    def body(carry, _):
        f_new, tots = chunk(carry, mask_ext_f)
        return f_new, tots

    f_final, tots = jax.lax.scan(body, f, None, length=num_steps // k_steps)
    return f_final, tots.reshape(num_steps)


def simulate_zy(
    nz: int, ny: int, nx: int, *,
    num_steps: int,
    omega: float = 1.85,
    density: float = 0.1,
    accel: float = 0.005,
    obstacle_mask=None,
    dtype=np.float32,
    mesh: Mesh | None = None,
    k_steps: int = 2,
    bz: int | None = None,
    local_engine: str = "inplace",
):
    """Full 3-D distributed simulation on the (z, y) 2-axis mesh. Same
    contract as d3q19.simulate / pallas_sharded_3d.simulate; both axes
    support uneven grids via pad-and-mask."""
    if mesh is None:
        n = len(jax.devices())
        n_z, n_y = mesh_lib.best_factorisation(
            n, nz, ny, require_even=False, for_padding=True)
        mesh = make_zy_mesh(n_z, n_y)
    n_z, n_y = mesh.devices.shape
    if obstacle_mask is None:
        obstacle_mask = np.zeros((nz, ny, nx), bool)
        obstacle_mask[0] = True
        obstacle_mask[-1] = True
    obstacle_np = np.asarray(obstacle_mask)

    hz, pad_z = plan_planes(nz, n_z, k_steps)
    hy, pad_y = plan_rows_y(ny, n_y)
    # the initial state is uniform equilibrium, so padded cells (dead,
    # masked as obstacles) start at the same equilibrium fill
    f_np = np.asarray(d3q19.initial_distributions(
        nz + pad_z, ny + pad_y, nx, density, dtype))
    f = jax.device_put(
        jnp.asarray(f_np), NamedSharding(mesh, P(None, ROW, COL, None)),
    )
    mask_ext_f = jax.device_put(
        jnp.asarray(extended_mask_zy(obstacle_np, n_z, n_y, k_steps),
                    f.dtype),
        NamedSharding(mesh, P(ROW, COL, None)),
    )
    f_final, tot = run_zy(
        f, mask_ext_f, mesh=mesh, num_steps=num_steps, k_steps=k_steps,
        omega=omega, density=density, accel=accel, accel_plane=nz - 2,
        nz=nz, ny=ny, bz=bz, local_engine=local_engine,
    )
    f_final = f_final[:, :nz, :ny]
    num_free = nz * ny * nx - int(obstacle_np.sum())
    return f_final, tot / jnp.asarray(num_free, f.dtype)
