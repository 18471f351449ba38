"""End-to-end D3Q19 drivers: chunked checkpoint/resume runs.

The 3-D counterpart of models/lbm.run_simulation_with_checkpoints (the
2-D docstring's contract applies: chunking is bit-identical to one
uninterrupted run of the same engine config; atomic .npz checkpoints;
resume validates the grid/physics signature). Engines: 'jax', 'pallas'
(auto K and shape config), 'native' (serial C++ oracle: no JAX compute,
no backend initialisation, no compile), 'sharded-pallas' (multi-chip).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from ..core import checkpoint
from ..ops import d3q19_lattice  # numpy-only; keeps engine='native' JAX-free


def select_k_steps(engine: str, num_steps: int, checkpoint_every: int,
                   nz: int, n_shards: int | None = None,
                   ny: int | None = None, nx: int | None = None) -> int:
    """Deepest K compatible with bit-exact chunking for this engine.

    Single-chip 'pallas' additionally needs nz % k == 0 (the kernel's
    z-halo blocks are K-plane aligned); 'sharded-pallas' pads uneven nz
    via plan_planes' pad-and-mask, so odd nz must NOT force K=1 there —
    but the pad plan must actually be feasible for the mesh (e.g. nz=7 on
    4 shards at K=2 would leave the last shard with < K valid planes), so
    the selector checks plan_planes for the real shard count.
    'pallas-inplace' only needs a feasible in-place config (k <= bz | nz),
    so K=3 — the TPU-measured production depth (6,386 vs 5,131 MLUPS,
    lbm3d-perf/inplace.csv) — is reachable when ny/nx are given."""
    if engine == "pallas-inplace" and ny is not None and nx is not None:
        from ..ops import d3q19_pallas_inplace_blocked

        for k in (3, 2, 1):
            if num_steps % k or checkpoint_every % k:
                continue
            try:
                d3q19_pallas_inplace_blocked.pick_engine(nz, ny, nx, k)
            except ValueError:
                continue
            return k
        return 1
    for k in (2, 1):
        if num_steps % k or checkpoint_every % k:
            continue
        if engine == "sharded-pallas":
            if n_shards is not None:
                from ..parallel import pallas_sharded_3d

                try:
                    pallas_sharded_3d.plan_planes(nz, n_shards, k)
                except ValueError:
                    continue
        elif nz % k:
            continue
        return k
    # nothing feasible (e.g. more shards than planes even at K=1): return
    # 1 and let the runner surface plan_planes' descriptive error
    return 1


def run_simulation_with_checkpoints(
    nz: int, ny: int, nx: int, *,
    num_steps: int,
    checkpoint_path: str | Path,
    checkpoint_every: int,
    omega: float = 1.85,
    density: float = 0.1,
    accel: float = 0.005,
    obstacle_mask=None,
    dtype=np.float32,
    engine: str = "jax",
    resume: bool = False,
    k_steps: int | None = None,
    num_devices: int | None = None,
):
    """Returns (f_final, av_vels, compute_seconds, steps_run). k_steps=None picks the
    deepest K dividing the total, the chunk size and nz (the Pallas kernel's
    constraints), so any step count the plain CLI accepts also checkpoints.
    engine='sharded-pallas' checkpoints the gathered GLOBAL state (valid
    planes only), so a checkpoint written on one z-mesh resumes on any
    other, like the 2-D multi-chip checkpointing."""
    if obstacle_mask is None:
        obstacle_mask = np.zeros((nz, ny, nx), bool)
        obstacle_mask[0] = True
        obstacle_mask[-1] = True
    mask_np = np.asarray(obstacle_mask, bool)
    num_free = int((~mask_np).sum())
    accel_plane = nz - 2
    np_dtype = np.dtype(dtype)

    pallas_like = engine in ("pallas", "pallas-inplace", "sharded-pallas")
    if pallas_like and k_steps is None:
        n_shards = None
        if engine == "sharded-pallas":
            import jax

            n_shards = num_devices or len(jax.devices())
        k_steps = select_k_steps(engine, num_steps, checkpoint_every, nz,
                                 n_shards=n_shards, ny=ny, nx=nx)
    if pallas_like and (num_steps % k_steps or checkpoint_every % k_steps):
        raise ValueError(
            f"pallas checkpointing needs num_steps ({num_steps}) and "
            f"checkpoint_every ({checkpoint_every}) divisible by k_steps "
            f"({k_steps}) for bit-exact chunking")
    if engine == "pallas" and nz % k_steps:
        raise ValueError(
            f"engine={engine!r} needs nz ({nz}) divisible by k_steps "
            f"({k_steps}): the kernel's z-halo blocks are K-plane aligned "
            "(use k_steps=None for auto-selection, or the jax engine)")
    if engine == "pallas-inplace":
        from ..ops import d3q19_pallas_inplace_blocked

        # raises a descriptive ValueError when no in-place config fits
        # this (nz, ny, nx) at the requested K (the slab/blocked routing
        # reused by run_chunk below)
        ip_kind, ip_bz, ip_by = d3q19_pallas_inplace_blocked.pick_engine(
            nz, ny, nx, k_steps)

    ck_path = Path(checkpoint_path)
    if resume and ck_path.exists():
        ck = checkpoint.load3d(ck_path, expect_shape=(nz, ny, nx),
                               expect_physics=(omega, density, accel))
        f_host = np.asarray(ck.f, np_dtype)
        start = ck.step
        if start > num_steps:
            raise ValueError(
                f"checkpoint is at step {start}, beyond the requested "
                f"{num_steps} steps — nothing to resume")
        if pallas_like and start % k_steps:
            raise ValueError(
                f"checkpoint step {start} is not a multiple of k_steps "
                f"({k_steps}) — resume with the engine config that wrote it")
        av_parts = [np.asarray(ck.av_vels, np.float64)]
    else:
        f_host = d3q19_lattice.initial_distributions(nz, ny, nx, density,
                                                     np_dtype.type)
        start = 0
        av_parts = []

    if engine == "native":
        from ..ops import d3q19_native

        f = np.ascontiguousarray(f_host)

        def run_chunk(f, n):
            tot = d3q19_native.run(f, mask_np, num_steps=n, omega=omega,
                                   density=density, accel=accel,
                                   accel_plane=accel_plane)
            return f, tot

        def gather(f):
            return f

        def divide(tot):
            return (tot.astype(np_dtype) / np_dtype.type(num_free)
                    ).astype(np.float64)

    elif engine in ("jax", "pallas", "pallas-inplace"):
        import jax.numpy as jnp

        from ..ops import d3q19

        f = jnp.asarray(f_host)
        mask = jnp.asarray(mask_np)
        mask_f = mask.astype(f.dtype)
        amask = d3q19.accel_plane_mask(nz, ny, nx, accel_plane, dtype=f.dtype)
        if engine == "pallas":
            from ..ops import d3q19_pallas

            bz, by = d3q19_pallas.choose_config(nz, ny, nx, k_steps)

        def run_chunk(f, n):
            if engine == "jax":
                return d3q19.run(f, mask, amask, num_steps=n, omega=omega,
                                 density=density, accel=accel)
            if engine == "pallas-inplace":
                from ..ops import (d3q19_pallas_inplace,
                                   d3q19_pallas_inplace_blocked)

                if ip_kind == "blocked":
                    return d3q19_pallas_inplace_blocked.run(
                        f, mask_f, num_steps=n, k_steps=k_steps,
                        omega=omega, density=density, accel=accel,
                        accel_plane=accel_plane, bz=ip_bz, by=ip_by)
                return d3q19_pallas_inplace.run(
                    f, mask_f, num_steps=n, k_steps=k_steps, omega=omega,
                    density=density, accel=accel, accel_plane=accel_plane,
                    bz=ip_bz)
            return d3q19_pallas.run(
                f, mask_f, num_steps=n, k_steps=k_steps, omega=omega,
                density=density, accel=accel, accel_plane=accel_plane,
                bz=bz, by=by)

        def gather(f):
            return np.asarray(f)

        def divide(tot):
            return np.asarray(
                np.asarray(tot, np.float64)
                .astype(np_dtype) / np_dtype.type(num_free), np.float64)

    elif engine == "sharded-pallas":
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh as mesh_lib, pallas_sharded_3d

        mesh = pallas_sharded_3d.make_z_mesh(num_devices)
        (n_shards,) = mesh.devices.shape
        _h, pad = pallas_sharded_3d.plan_planes(nz, n_shards, k_steps)
        f_np = np.asarray(f_host)
        if pad:
            f_np = np.concatenate(
                [f_np, d3q19_lattice.initial_distributions(pad, ny, nx, density,
                                                   np_dtype.type)], axis=1)
        f = jax.device_put(
            jnp.asarray(f_np),
            NamedSharding(mesh, P(None, mesh_lib.ROW_AXIS, None, None)))
        mask_ext = jax.device_put(
            jnp.asarray(pallas_sharded_3d.extended_mask(
                mask_np, n_shards, k_steps), f.dtype),
            NamedSharding(mesh, P(mesh_lib.ROW_AXIS, None, None)))

        def run_chunk(f, n):
            return pallas_sharded_3d.run(
                f, mask_ext, mesh=mesh, num_steps=n, k_steps=k_steps,
                omega=omega, density=density, accel=accel,
                accel_plane=accel_plane, nz=nz)

        def gather(f):
            return np.asarray(f)[:, :nz]

        def divide(tot):
            return np.asarray(
                np.asarray(tot, np.float64)
                .astype(np_dtype) / np_dtype.type(num_free), np.float64)

    else:
        raise ValueError(
            f"unknown engine {engine!r} for 3-D checkpointing "
            "(jax | pallas | sharded-pallas | native)")

    steps_run = num_steps - start
    t0 = time.perf_counter()
    while start < num_steps:
        n = min(checkpoint_every, num_steps - start)
        f, tot = run_chunk(f, n)
        av_parts.append(divide(np.asarray(tot, np.float64)))
        start += n
        checkpoint.save3d(ck_path, gather(f), np.concatenate(av_parts),
                          start, omega=omega, density=density, accel=accel)
    compute_seconds = time.perf_counter() - t0
    return gather(f), np.concatenate(av_parts), compute_seconds, steps_run


def final_state_slice_fields(f: np.ndarray, mask: np.ndarray, z: int,
                             density: float):
    """Macroscopic (u_x, u_y, u, pressure, obstacle) on plane z.

    u_x/u_y are the in-plane velocity components; `u` is the full 3-D speed
    |u| (so the checker column keeps its physical meaning); pressure is
    rho * c_s^2 with the 2-D writer's obstacle conventions
    (core/io.final_state_fields)."""
    dtype = f.dtype
    fz = np.asarray(f[:, z])
    rho = fz.sum(axis=0, dtype=dtype)
    ex, ey, ez = (d3q19_lattice.E[:, 2], d3q19_lattice.E[:, 1],
                  d3q19_lattice.E[:, 0])
    u_x = np.tensordot(ex.astype(dtype), fz, axes=1) / rho
    u_y = np.tensordot(ey.astype(dtype), fz, axes=1) / rho
    u_z = np.tensordot(ez.astype(dtype), fz, axes=1) / rho
    u = np.sqrt(u_x * u_x + u_y * u_y + u_z * u_z)
    c_sq = np.asarray(1.0, dtype) / np.asarray(3.0, dtype)
    pressure = rho * c_sq
    obs = np.asarray(mask[z], bool)
    zero = np.asarray(0.0, dtype)
    u_x = np.where(obs, zero, u_x)
    u_y = np.where(obs, zero, u_y)
    u = np.where(obs, zero, u)
    pressure = np.where(obs, np.asarray(density, dtype) * c_sq, pressure)
    return u_x, u_y, u, pressure, obs


def write_final_state_slice(path, f: np.ndarray, mask: np.ndarray, z: int,
                            density: float) -> None:
    """Write plane z in the exact 2-D final_state.dat format
    (`x y u_x u_y u pressure obstacle`) so verify/check.py and
    cli/flow_viz.py consume 3-D results unchanged."""
    from ..core import io

    u_x, u_y, u, pressure, obs = final_state_slice_fields(f, mask, z, density)
    io.write_final_state_arrays(path, u_x, u_y, u, pressure, obs)
