"""Communication-avoiding multi-chip D3Q19: ghost-plane exchange + local
K-step Pallas kernel.

The 3-D production distributed path — the z-axis instantiation of the 2-D
scheme in pallas_sharded.py. Each shard owns a contiguous slab of z-planes
over a 1-D ('ry',) mesh row axis; y and x stay whole on every shard (their
periodic wrap lives inside the kernel's rolls). Shards carry K ghost planes
per side, exchanged once per K steps with one `lax.ppermute` pair; the fused
K-step z-slab kernel (ops/d3q19_pallas.py) then advances the ghost-extended
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

from ..ops import d3q19, d3q19_pallas
from . import halo as halo_lib, mesh as mesh_lib

ROW = mesh_lib.ROW_AXIS


def make_z_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]).reshape(n), (ROW,))


def extended_mask(obstacle_mask: np.ndarray, n_shards: int, ghost: int) -> np.ndarray:
    """Per-shard ghost-extended obstacle masks stacked to (r*(h+2g), ny, nx)."""
    nz, ny, nx = obstacle_mask.shape
    if nz % n_shards:
        raise ValueError(f"nz {nz} not divisible by {n_shards} z-shards")
    h = nz // n_shards
    if h < ghost:
        raise ValueError(f"shard depth {h} < ghost depth {ghost}")
    blocks = []
    for s in range(n_shards):
        planes = (s * h - ghost + np.arange(h + 2 * ghost)) % nz
        blocks.append(obstacle_mask[planes])
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
):
    """Jittable fn advancing the z-sharded state K steps:
    (f (19,nz,ny,nx) P(None,'ry',None,None), mask_ext P('ry',None,None))
    -> (f', tot_u (K,) replicated)."""
    (n_shards,) = mesh.devices.shape
    h = nz // n_shards
    g = k_steps  # ghost depth = steps absorbed between exchanges

    def local_chunk(f_loc, mask_ext_f):
        ghost_s = halo_lib.ring_shift(f_loc[:, -g:], ROW, +1)
        ghost_n = halo_lib.ring_shift(f_loc[:, :g], ROW, -1)
        ext = jnp.concatenate([ghost_s, f_loc, ghost_n], axis=1)

        shard_z0 = jax.lax.axis_index(ROW).astype(jnp.int32) * h
        ext_new, tots = d3q19_pallas.stepk(
            ext, mask_ext_f, k_steps=k_steps, omega=omega, density=density,
            accel=accel, accel_plane=accel_plane, bz=bz, interpret=interpret,
            vmem_limit=vmem_limit,
            plane_offset=shard_z0 - g,
            valid_planes=(g, g + h),
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


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "k_steps", "omega", "density",
                     "accel", "accel_plane", "nz", "bz", "interpret",
                     "vmem_limit"),
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
):
    if num_steps % k_steps:
        raise ValueError("num_steps must be a multiple of k_steps")
    chunk = make_chunk_fn(
        mesh, k_steps=k_steps, omega=omega, density=density, accel=accel,
        accel_plane=accel_plane, nz=nz, bz=bz, interpret=interpret,
        vmem_limit=vmem_limit,
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
):
    """Full 3-D distributed simulation on the ghost-plane + local-Pallas
    path. Same contract as d3q19.simulate."""
    if mesh is None:
        mesh = make_z_mesh()
    (n_shards,) = mesh.devices.shape
    if obstacle_mask is None:
        obstacle_mask = np.zeros((nz, ny, nx), bool)
        obstacle_mask[0] = True
        obstacle_mask[-1] = True
    obstacle_np = np.asarray(obstacle_mask)

    f = jax.device_put(
        jnp.asarray(d3q19.initial_distributions(nz, ny, nx, density, dtype)),
        NamedSharding(mesh, P(None, ROW, None, None)),
    )
    mask_ext_f = jax.device_put(
        jnp.asarray(extended_mask(obstacle_np, n_shards, k_steps), f.dtype),
        NamedSharding(mesh, P(ROW, None, None)),
    )
    f_final, tot = run(
        f, mask_ext_f, mesh=mesh, num_steps=num_steps, k_steps=k_steps,
        omega=omega, density=density, accel=accel, accel_plane=nz - 2,
        nz=nz, bz=bz,
    )
    num_free = nz * ny * nx - int(obstacle_np.sum())
    return f_final, tot / jnp.asarray(num_free, f.dtype)
