"""D3Q19 BGK lattice-Boltzmann: the 3-D generalisation of the D2Q9 engine.

The stretch goal from BASELINE.json config 5 — the reference is 2-D only, so
this module generalises the same fused collide-and-stream design (pull
streaming via rolls, bounce-back rebound, BGK collision, accelerated-plane
body force, per-step Sum|u|) to the standard 19-velocity 3-D lattice.

State: (19, nz, ny, nx). Axis order (z, y, x); speed k has unit velocity
E[k] = (dz, dy, dx). Weights: 1/3 (rest), 1/18 (6 axis), 1/36 (12 edge).
The accelerated-plane force generalises the reference's accelerated row
(main/LastChance.cpp:158-183): speed k on the target z-plane gains
sign(e_x[k]) * rho * accel * W[k].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# lattice constants + init live in the numpy-only d3q19_lattice module
# (shared with the no-JAX native oracle); re-exported here for callers
from .d3q19_lattice import (  # noqa: F401
    E, NUM_SPEEDS, OPPOSITE, W, initial_distributions,
)

# BGK equilibrium expression grouping (VERDICT #7 lane-op audit). 'paired'
# (default): opposite-pair sharing, ~35% fewer equilibrium plane-ops; the
# env var exists so the A/B experiment (experiments/lbm3d-perf/regroup.py)
# can run each variant in its own process (kernels inline this function,
# so the variant must be fixed per process for cache coherence).
import os as _os

GROUPING = _os.environ.get("LBM_D3Q19_GROUPING", "paired")


def equilibrium(rho, u_x, u_y, u_z) -> jax.Array:
    """Maxwell-Boltzmann equilibrium at (rho, u) on the D3Q19 lattice.

    Kept in the reference's rearranged per-speed grouping; collide_fields'
    default paired grouping computes the algebraically identical value, so
    equilibrium remains a collision fixed point modulo float rounding
    (test_equilibrium_is_stationary, rtol 1e-12). Inputs broadcast to the
    grid shape; returns (19, nz, ny, nx). Counterpart of d2q9.equilibrium.
    """
    u_sq = u_x * u_x + u_y * u_y + u_z * u_z
    c_sq = 1.0 - u_sq * 1.5
    outs = []
    for k in range(NUM_SPEEDS):
        wk = float(W[k])
        if not E[k].any():
            outs.append(wk * rho * c_sq)
            continue
        eu = 0.0
        if E[k, 2]:
            eu = eu + int(E[k, 2]) * u_x
        if E[k, 1]:
            eu = eu + int(E[k, 1]) * u_y
        if E[k, 0]:
            eu = eu + int(E[k, 0]) * u_z
        outs.append(wk * rho * ((4.5 * eu) * (2.0 / 3.0 + eu) + c_sq))
    return jnp.stack(outs)


def stream_pull(f: jax.Array) -> list[jax.Array]:
    """Periodic pull: speed k at x comes from x - e_k."""
    return [
        jnp.roll(f[k], tuple(int(d) for d in E[k]), axis=(-3, -2, -1))
        if E[k].any() else f[k]
        for k in range(NUM_SPEEDS)
    ]


def collide_fields(
    s: list[jax.Array],
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    omega: float,
    density: float,
    accel: float,
):
    """BGK collide + bounce-back + accelerated-plane force on streamed planes.
    Returns (f_new (19,...), u_plane |u| with obstacles zeroed)."""
    dt = s[0].dtype
    rho = functools.reduce(jnp.add, s)
    u_x = functools.reduce(
        jnp.add, (int(E[k, 2]) * s[k] for k in range(NUM_SPEEDS) if E[k, 2])
    ) / rho
    u_y = functools.reduce(
        jnp.add, (int(E[k, 1]) * s[k] for k in range(NUM_SPEEDS) if E[k, 1])
    ) / rho
    u_z = functools.reduce(
        jnp.add, (int(E[k, 0]) * s[k] for k in range(NUM_SPEEDS) if E[k, 0])
    ) / rho
    u_sq = u_x * u_x + u_y * u_y + u_z * u_z
    c_sq = 1.0 - u_sq * 1.5
    one_minus_omega = 1.0 - omega

    if GROUPING == "paired":
        # round-4 lane-op regrouping (VERDICT #7): opposite speed pairs
        # share eu (eu_opp = -eu), the quadratic equilibrium term, the
        # per-weight-class w*omega*rho product and the accel-force
        # product — ~35% fewer equilibrium plane-ops than the per-speed
        # reference grouping. Algebraically identical ((4.5eu)(2/3+eu) =
        # 3eu + 4.5eu^2); rounding differs at the ulp level, so the
        # native oracle (native/d3q19_serial.cpp) carries the SAME
        # grouping and the committed 3-D golden trace was minted from it.
        outs = [None] * NUM_SPEEDS
        wro = {w: (float(w) * omega) * rho for w in (W[0], W[1], W[7])}
        outs[0] = s[0] * one_minus_omega + wro[W[0]] * c_sq
        for k in range(1, NUM_SPEEDS):
            kb = int(OPPOSITE[k])
            if kb < k:
                continue
            eu = 0.0
            if E[k, 2]:
                eu = eu + int(E[k, 2]) * u_x
            if E[k, 1]:
                eu = eu + int(E[k, 1]) * u_y
            if E[k, 0]:
                eu = eu + int(E[k, 0]) * u_z
            quad = (4.5 * eu) * eu + c_sq
            lin = 3.0 * eu
            w = wro[W[k]]
            out_k = s[k] * one_minus_omega + w * (quad + lin)
            out_kb = s[kb] * one_minus_omega + w * (quad - lin)
            if E[k, 2]:  # accelerated-plane force on x-moving speeds
                t = accel_mask * (int(E[k, 2]) * (density * accel * float(W[k])))
                out_k = out_k + t
                out_kb = out_kb - t
            outs[k] = out_k
            outs[kb] = out_kb
    else:
        outs = []
        for k in range(NUM_SPEEDS):
            eu = 0.0
            if E[k, 2]:
                eu = eu + int(E[k, 2]) * u_x
            if E[k, 1]:
                eu = eu + int(E[k, 1]) * u_y
            if E[k, 0]:
                eu = eu + int(E[k, 0]) * u_z
            wk = float(W[k])
            if isinstance(eu, float):  # rest speed
                feq_term = wk * rho * omega * c_sq
            else:
                # w rho omega (c_sq + 3 eu + 4.5 eu^2), in the reference's
                # rearranged (4.5 eu)(2/3 + eu) + c_sq form
                feq_term = wk * rho * omega * ((4.5 * eu) * (2.0 / 3.0 + eu) + c_sq)
            out = s[k] * one_minus_omega + feq_term
            if E[k, 2]:  # accelerated-plane force on x-moving speeds
                out = out + accel_mask * (int(E[k, 2]) * (density * accel * wk))
            outs.append(out)

    f_new = jnp.stack(
        [jnp.where(obstacle_mask, s[int(OPPOSITE[k])], outs[k])
         for k in range(NUM_SPEEDS)]
    )
    zero = jnp.zeros((), dt)
    u_plane = jnp.where(obstacle_mask, zero, jnp.sqrt(u_sq))
    return f_new, u_plane


def step(
    f: jax.Array,
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    omega: float,
    density: float,
    accel: float,
):
    s = stream_pull(f)
    f_new, u = collide_fields(
        s, obstacle_mask, accel_mask, omega=omega, density=density, accel=accel
    )
    return f_new, jnp.sum(u)


def accel_plane_mask(nz: int, ny: int, nx: int, plane_z: int,
                     dtype=jnp.float32) -> jax.Array:
    zs = jnp.arange(nz, dtype=jnp.int32)
    return (zs == plane_z).astype(dtype)[:, None, None]


@functools.partial(
    jax.jit, static_argnames=("num_steps", "omega", "density", "accel")
)
def run(
    f: jax.Array,
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    num_steps: int,
    omega: float,
    density: float,
    accel: float,
):
    def body(carry, _):
        f_new, tot = step(
            carry, obstacle_mask, accel_mask,
            omega=omega, density=density, accel=accel,
        )
        return f_new, tot

    return jax.lax.scan(body, f, None, length=num_steps)


def simulate(
    nz: int, ny: int, nx: int, *,
    num_steps: int,
    omega: float = 1.85,
    density: float = 0.1,
    accel: float = 0.005,
    obstacle_mask=None,
    dtype=np.float32,
    engine: str = "jax",
    k_steps: int | None = None,
    num_devices: int | None = None,
    overlap: bool = False,
    mesh_shape: tuple | None = None,
):
    """Lid-driven-style 3-D run: accelerated plane at z = nz-2, walls at
    z = 0 and z = nz-1 (the 3-D analogue of the shipped 2-D configs).
    engine='pallas' uses the fused K-step kernel (d3q19_pallas);
    engine='pallas-inplace' the explicitly pipelined aliased family
    (one HBM stream: the z-slab kernel where its working set fits —
    6,386 vs 3,253 MLUPS at the bench shape on v5e at K=3 — and the
    (z, y)-blocked d3q19_pallas_inplace_blocked beyond, 4,417 vs 2,994
    at 32x256x256; an explicit k_steps is honoured exactly — it raises
    if infeasible, like every other engine — lbm3d-perf/inplace.csv).
    k_steps=None picks each engine's measured-best depth (3 for the
    in-place family, 2 otherwise);
    engine='sharded' runs the jax step on a (z, y)-sharded mesh with
    XLA-implicit halo collectives (the 3-D multi-chip path — the winning
    "implicit" strategy of the 2-D halo study applied to z/y planes);
    engine='sharded-pallas-zy' runs the ghost-cell + local-Pallas path on
    a (z, y) 2-AXIS device mesh (mesh_shape=(n_z, n_y), auto-factorised
    when omitted) — the 3-D analogue of the reference's rows x cols
    partitioner (StructuredGridUtils.hpp:472-561)."""
    if overlap and engine != "sharded-pallas":
        raise ValueError(
            f"overlap=True is only implemented for engine='sharded-pallas' "
            f"(ghost-plane exchange/compute overlap), not engine={engine!r}")
    auto_k = k_steps is None
    if auto_k:
        k_steps = 3 if engine == "pallas-inplace" else 2
    if engine == "native":
        from . import d3q19_native

        return d3q19_native.simulate(
            nz, ny, nx, num_steps=num_steps, omega=omega, density=density,
            accel=accel, obstacle_mask=obstacle_mask, dtype=dtype)
    if engine == "sharded-pallas-zy":
        from ..parallel import pallas_sharded_3d

        mesh = (pallas_sharded_3d.make_zy_mesh(*mesh_shape)
                if mesh_shape is not None else None)
        return pallas_sharded_3d.simulate_zy(
            nz, ny, nx, num_steps=num_steps, omega=omega, density=density,
            accel=accel,
            obstacle_mask=None if obstacle_mask is None
            else np.asarray(obstacle_mask),
            dtype=dtype, k_steps=k_steps, mesh=mesh,
        )
    if engine == "sharded-pallas":
        # dispatch before building the lattice: pallas_sharded_3d.simulate
        # constructs its own sharded state
        from ..parallel import pallas_sharded_3d

        return pallas_sharded_3d.simulate(
            nz, ny, nx, num_steps=num_steps, omega=omega, density=density,
            accel=accel,
            obstacle_mask=None if obstacle_mask is None
            else np.asarray(obstacle_mask),
            dtype=dtype, k_steps=k_steps,
            mesh=pallas_sharded_3d.make_z_mesh(num_devices),
            overlap=overlap,
        )
    f = jnp.asarray(initial_distributions(nz, ny, nx, density, dtype))
    if obstacle_mask is None:
        obstacle_mask = np.zeros((nz, ny, nx), bool)
        obstacle_mask[0] = True
        obstacle_mask[-1] = True
    obstacle_mask = jnp.asarray(obstacle_mask)
    if engine == "sharded":
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh as mesh_lib

        n = num_devices or len(jax.devices())
        # shard z and y; x stays local. Implicit sharding (no pad-and-mask
        # here) needs exact splits — require_even gives a clear error;
        # uneven nz runs on engine='sharded-pallas' instead.
        mesh = mesh_lib.make_mesh(n, nz, ny, require_even=True)
        fs = NamedSharding(mesh, P(None, mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS, None))
        ms = NamedSharding(mesh, P(mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS, None))
        f = jax.device_put(f, fs)
        obstacle_mask = jax.device_put(obstacle_mask, ms)
        amask = jax.device_put(
            accel_plane_mask(nz, ny, nx, nz - 2, dtype=f.dtype),
            NamedSharding(mesh, P(mesh_lib.ROW_AXIS, None, None)),
        )
        f_final, tot = run(
            f, obstacle_mask, amask,
            num_steps=num_steps, omega=omega, density=density, accel=accel,
        )
    elif engine == "pallas":
        from . import d3q19_pallas

        if num_steps % k_steps or nz % k_steps:
            k_steps = 1
        bz, by = d3q19_pallas.choose_config(nz, ny, nx, k_steps)
        f_final, tot = d3q19_pallas.run(
            f, obstacle_mask.astype(f.dtype), num_steps=num_steps,
            k_steps=k_steps, omega=omega, density=density, accel=accel,
            accel_plane=nz - 2, bz=bz, by=by,
        )
    elif engine == "pallas-inplace":
        from . import d3q19_pallas_inplace, d3q19_pallas_inplace_blocked

        kind, bz, by, k = d3q19_pallas_inplace_blocked.choose_k(
            nz, ny, nx, num_steps, max_k=k_steps)
        if not auto_k and k != k_steps:
            # every other engine honours an explicit k_steps exactly or
            # raises — never silently run a benchmark at a different K
            raise ValueError(
                f"k_steps={k_steps} has no feasible in-place config for "
                f"{nz}x{ny}x{nx} (deepest feasible: K={k}); pass "
                "k_steps=None to auto-pick or use engine='pallas'")
        if kind == "slab":
            f_final, tot = d3q19_pallas_inplace.run(
                f, obstacle_mask.astype(f.dtype), num_steps=num_steps,
                k_steps=k, omega=omega, density=density, accel=accel,
                accel_plane=nz - 2, bz=bz,
            )
        else:
            f_final, tot = d3q19_pallas_inplace_blocked.run(
                f, obstacle_mask.astype(f.dtype), num_steps=num_steps,
                k_steps=k, omega=omega, density=density, accel=accel,
                accel_plane=nz - 2, bz=bz, by=by,
            )
    else:
        amask = accel_plane_mask(nz, ny, nx, nz - 2, dtype=f.dtype)
        f_final, tot = run(
            f, obstacle_mask, amask,
            num_steps=num_steps, omega=omega, density=density, accel=accel,
        )
    num_free = jnp.asarray((~obstacle_mask).sum(), dtype=f.dtype)
    return f_final, tot / num_free
