"""D2Q9 BGK lattice-Boltzmann: fused collide-and-stream step in pure JAX.

This is the numerically-authoritative engine. One `step` fuses pull-streaming
(periodic wraparound via `jnp.roll`), obstacle bounce-back rebound, BGK
collision (in the algebraically-rearranged `c_sq = 1 - 1.5 u^2` form) and the
accelerated-row body force, and emits the per-step summed |u| — exactly the
semantics of the reference's serial golden kernel (main/LastChance.cpp:185-267)
and its fused IPU vertex (main/codelets/D2Q9Codelets.cpp:94-191).

TPU notes:
  * The nine (ny, nx) planes are a stacked (9, ny, nx) array; every op is a
    full-plane VPU op, so XLA fuses the whole step into a few HBM-bandwidth-
    bound loops. The Pallas kernel in d2q9_pallas.py is the hand-fused,
    single-pass version of the same math.
  * Applied to an array sharded over a `jax.sharding.Mesh`, `jnp.roll` makes
    XLA insert the halo collectives automatically — the analogue of the
    reference's compiler-scheduled "implicit" halo exchange, which its own
    experiments found fastest (experiments/halo-exchange-approaches). The
    explicit `shard_map` + `ppermute` version lives in parallel/halo.py.
  * The whole time loop is a `lax.scan` inside one jit: zero host round-trips,
    like the reference's on-device `Repeat` program (main/LbmAoS.cpp:354-356).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.params import Params


class AccelWeights(NamedTuple):
    """Body-force row weights w1 = rho*accel/9, w2 = rho*accel/36
    (reference: main/LastChance.cpp:158-159)."""

    w1: float
    w2: float

    @classmethod
    def from_params(cls, params: Params) -> "AccelWeights":
        return cls(params.density * params.accel / 9.0, params.density * params.accel / 36.0)


def stream_pull(f: jax.Array) -> tuple[jax.Array, ...]:
    """Periodic pull-streaming: speed k at cell x comes from x - e_k.

    Matches main/LastChance.cpp:203-211. `f` has shape (9, ny, nx); row axis
    is -2 (jj, northwards), column axis is -1 (ii, eastwards).
    """
    return (
        f[0],
        jnp.roll(f[1], 1, axis=-1),  # east: from west neighbour
        jnp.roll(f[2], 1, axis=-2),  # north: from south neighbour
        jnp.roll(f[3], -1, axis=-1),  # west: from east neighbour
        jnp.roll(f[4], -1, axis=-2),  # south: from north neighbour
        jnp.roll(f[5], (1, 1), axis=(-2, -1)),  # north-east
        jnp.roll(f[6], (1, -1), axis=(-2, -1)),  # north-west
        jnp.roll(f[7], (-1, -1), axis=(-2, -1)),  # south-west
        jnp.roll(f[8], (-1, 1), axis=(-2, -1)),  # south-east
    )


def collide_fields(
    s: tuple[jax.Array, ...],
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    shared_reciprocal: bool = False,
):
    """BGK collision + rebound + accelerated-row force on streamed planes.

    `s` are the nine post-streaming planes; `obstacle_mask` is bool;
    `accel_mask` is a {0,1} float plane (1 on the accelerated row, broadcastable).
    Returns (f_new stacked (9, ny, nx), u_plane) where u_plane is |u| with
    obstacle cells zeroed — callers reduce it themselves (the fused Pallas
    kernels sum only their band's interior rows).

    Expression grouping mirrors main/LastChance.cpp:213-262 for float32
    fidelity with the golden data. shared_reciprocal=True computes 1/rho
    once and multiplies (one division instead of two) — ~1 ulp different
    per step, same state-rounding error scale; measured in
    experiments/arithmetic-variants.
    """
    s0, s1, s2, s3, s4, s5, s6, s7, s8 = s
    one_minus_omega = 1.0 - omega

    rho = s0 + s1 + s2 + s3 + s4 + s5 + s6 + s7 + s8
    if shared_reciprocal:
        inv_rho = 1.0 / rho
        u_x = (s1 + s5 + s8 - (s3 + s6 + s7)) * inv_rho
        u_y = (s2 + s5 + s6 - (s4 + s7 + s8)) * inv_rho
    else:
        u_x = (s1 + s5 + s8 - (s3 + s6 + s7)) / rho
        u_y = (s2 + s5 + s6 - (s4 + s7 + s8)) / rho
    u_sq = u_x * u_x + u_y * u_y

    c_sq = 1.0 - u_sq * 1.5
    ld0 = 4.0 / 9.0 * rho * omega
    ld1 = rho / 9.0 * omega
    ld2 = rho / 36.0 * omega
    u_s = u_x + u_y
    u_d = -u_x + u_y

    two_thirds = 2.0 / 3.0
    out0 = s0 * one_minus_omega + ld0 * c_sq
    out1 = s1 * one_minus_omega + ld1 * ((4.5 * u_x) * (two_thirds + u_x) + c_sq)
    out2 = s2 * one_minus_omega + ld1 * ((4.5 * u_y) * (two_thirds + u_y) + c_sq)
    out3 = s3 * one_minus_omega + ld1 * ((-4.5 * u_x) * (two_thirds - u_x) + c_sq)
    out4 = s4 * one_minus_omega + ld1 * ((-4.5 * u_y) * (two_thirds - u_y) + c_sq)
    out5 = s5 * one_minus_omega + ld2 * ((4.5 * u_s) * (two_thirds + u_s) + c_sq)
    out6 = s6 * one_minus_omega + ld2 * ((4.5 * u_d) * (two_thirds + u_d) + c_sq)
    out7 = s7 * one_minus_omega + ld2 * ((-4.5 * u_s) * (two_thirds - u_s) + c_sq)
    out8 = s8 * one_minus_omega + ld2 * ((-4.5 * u_d) * (two_thirds - u_d) + c_sq)

    # fold the accelerated-row body force into the collided state
    # (main/LastChance.cpp:253-261). accel_mask=None skips the force ops
    # entirely (the adds are exact no-ops when the mask is all-zero, so
    # skipping is bit-identical on physical states). NOTE: the round-4
    # per-band pl.when fast path that motivated this was measured a ~32%
    # LOSS and reverted (d2q9-overlap/regress_probe.csv); None remains
    # supported for stream_only diagnostics and future callers.
    if accel_mask is not None:
        aw1 = accel_mask * accel_w1
        aw2 = accel_mask * accel_w2
        out1 = out1 + aw1
        out3 = out3 - aw1
        out5 = out5 + aw2
        out6 = out6 - aw2
        out7 = out7 - aw2
        out8 = out8 + aw2

    # obstacle cells: pure bounce-back of the streamed speeds
    # (main/LastChance.cpp:213-223)
    f_new = jnp.stack(
        [
            jnp.where(obstacle_mask, s0, out0),
            jnp.where(obstacle_mask, s3, out1),
            jnp.where(obstacle_mask, s4, out2),
            jnp.where(obstacle_mask, s1, out3),
            jnp.where(obstacle_mask, s2, out4),
            jnp.where(obstacle_mask, s7, out5),
            jnp.where(obstacle_mask, s8, out6),
            jnp.where(obstacle_mask, s5, out7),
            jnp.where(obstacle_mask, s6, out8),
        ]
    )

    zero = jnp.zeros((), dtype=u_sq.dtype)
    u_plane = jnp.where(obstacle_mask, zero, jnp.sqrt(u_sq))
    return f_new, u_plane


def collide(
    s: tuple[jax.Array, ...],
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    omega: float,
    accel_w1: float,
    accel_w2: float,
):
    """collide_fields with the |u| plane reduced to the scalar tot_u."""
    f_new, u_plane = collide_fields(
        s, obstacle_mask, accel_mask,
        omega=omega, accel_w1=accel_w1, accel_w2=accel_w2,
    )
    return f_new, jnp.sum(u_plane)


def equilibrium(rho: jax.Array, u_x: jax.Array, u_y: jax.Array) -> jax.Array:
    """Maxwell-Boltzmann equilibrium distributions at (rho, u).

    feq_k = w_k rho (1 + 3 e_k.u + 4.5 (e_k.u)^2 - 1.5 u^2), written in the
    same rearranged `(4.5 eu)(2/3 + eu) + c_sq` grouping as `collide_fields`
    so an equilibrium state is an exact fixed point of the collision operator
    (modulo floating point). Used to initialise simulations from macroscopic
    fields (e.g. the analytic flows in tests/test_physics.py); the reference
    only ever initialises at rest (main/LastChance.cpp:428-450), where this
    reduces to `state.initial_distributions`.

    Inputs broadcast together to the grid shape; returns (9, ny, nx).
    """
    u_sq = u_x * u_x + u_y * u_y
    c_sq = 1.0 - u_sq * 1.5
    u_s = u_x + u_y
    u_d = -u_x + u_y
    w0 = 4.0 / 9.0 * rho
    w1 = rho / 9.0
    w2 = rho / 36.0

    def term(eu):
        return (4.5 * eu) * (2.0 / 3.0 + eu) + c_sq

    return jnp.stack(
        [
            w0 * c_sq,
            w1 * term(u_x),
            w1 * term(u_y),
            w1 * term(-u_x),
            w1 * term(-u_y),
            w2 * term(u_s),
            w2 * term(u_d),
            w2 * term(-u_s),
            w2 * term(-u_d),
        ]
    )


def accel_row_mask(ny: int, nx: int, accel_row: int, dtype=jnp.float32) -> jax.Array:
    """{0,1} column mask selecting the accelerated row (broadcasts over nx)."""
    rows = jnp.arange(ny, dtype=jnp.int32)
    return (rows == accel_row).astype(dtype)[:, None]


def step(
    f: jax.Array,
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    omega: float,
    accel_w1: float,
    accel_w2: float,
):
    """One fused timestep on the full periodic grid. Returns (f', tot_u)."""
    s = stream_pull(f)
    return collide(
        s, obstacle_mask, accel_mask, omega=omega, accel_w1=accel_w1, accel_w2=accel_w2
    )


def first_accelerate(
    f: jax.Array,
    obstacle_mask: jax.Array,
    *,
    accel_row: int,
    accel_w1: float,
    accel_w2: float,
) -> jax.Array:
    """One-off guarded acceleration of the target row before the loop.

    Unlike the in-step force, this variant guards against driving densities
    negative (reference: main/LastChance.cpp:163-183, and
    FirstAccelerateVertex in main/codelets/D2Q9Codelets.cpp:193-224).
    """
    dtype = f.dtype
    w1 = jnp.asarray(accel_w1, dtype)
    w2 = jnp.asarray(accel_w2, dtype)
    row = f[:, accel_row, :]
    obs = obstacle_mask[accel_row, :]
    ok = (~obs) & (row[3] - w1 > 0) & (row[6] - w2 > 0) & (row[7] - w2 > 0)
    deltas = jnp.stack(
        [
            jnp.zeros_like(row[0]),
            jnp.where(ok, w1, 0),
            jnp.zeros_like(row[0]),
            jnp.where(ok, -w1, 0),
            jnp.zeros_like(row[0]),
            jnp.where(ok, w2, 0),
            jnp.where(ok, -w2, 0),
            jnp.where(ok, -w2, 0),
            jnp.where(ok, w2, 0),
        ]
    )
    return f.at[:, accel_row, :].add(deltas.astype(dtype))


@functools.partial(jax.jit, static_argnames=("num_steps", "omega", "accel_w1", "accel_w2", "unroll"))
def run(
    f: jax.Array,
    obstacle_mask: jax.Array,
    accel_mask: jax.Array,
    *,
    num_steps: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    unroll: int = 1,
):
    """`num_steps` fused timesteps as one on-device `lax.scan`.

    Returns (f_final, tot_u_per_step of shape (num_steps,)). The analogue of
    the reference's compiled `Repeat(maxIters/2, two_timesteps)` program
    (main/LbmAoS.cpp:354-356) — the host is not involved between steps.
    """

    def body(carry, _):
        f_new, tot_u = step(
            carry,
            obstacle_mask,
            accel_mask,
            omega=omega,
            accel_w1=accel_w1,
            accel_w2=accel_w2,
        )
        return f_new, tot_u

    return jax.lax.scan(body, f, None, length=num_steps, unroll=unroll)


# Empirical TPU-worker stability fence (experiments/large-grid): a single
# 2000-step scan of the fused jnp.roll graph at 8192^2 f32 crashes the v5e
# worker ("UNAVAILABLE: TPU worker process crashed" — the 2.4 GB/buffer
# transient footprint is near the HBM edge), while 496-step dispatches of
# the SAME body run clean. simulate() chunks long runs at/above this cell
# count into <= CRASH_FENCE_STEPS dispatches; the per-step maths and scan
# body are identical, only the host re-dispatches between chunks.
# Override (at your own risk / on other hardware): LBM_UNFENCED_SCAN=1.
CRASH_FENCE_CELLS = 8192 * 8192
CRASH_FENCE_STEPS = 496


def _fence_chunks(num_steps: int, cells: int, backend: str) -> list[int]:
    """Dispatch lengths for simulate(): [num_steps] when no fence applies,
    else <= CRASH_FENCE_STEPS pieces (repro: experiments/large-grid/
    crash_repro_8192.py)."""
    import os

    if (cells < CRASH_FENCE_CELLS or num_steps <= CRASH_FENCE_STEPS
            or backend != "tpu" or os.environ.get("LBM_UNFENCED_SCAN") == "1"):
        return [num_steps]
    n_chunks = -(-num_steps // CRASH_FENCE_STEPS)
    base = num_steps // n_chunks
    rem = num_steps - base * n_chunks
    return [base + (1 if i < rem else 0) for i in range(n_chunks)]


def simulate(params: Params, f: jax.Array, obstacle_mask: jax.Array, *, unroll: int = 1):
    """Full reference-semantics simulation: first-accelerate, then max_iters
    fused steps; returns (f_final, av_vels) with av_vels already divided by
    the free-cell count (main/LastChance.cpp:266)."""
    aw = AccelWeights.from_params(params)
    accel_row = params.ny - 2
    obstacle_mask = jnp.asarray(obstacle_mask)
    f = first_accelerate(
        jnp.asarray(f), obstacle_mask, accel_row=accel_row, accel_w1=aw.w1, accel_w2=aw.w2
    )
    amask = accel_row_mask(params.ny, params.nx, accel_row, dtype=f.dtype)
    tot_parts = []
    for n in _fence_chunks(params.max_iters, params.ny * params.nx,
                           jax.default_backend()):
        f, tot_u = run(
            f,
            obstacle_mask,
            amask,
            num_steps=n,
            omega=params.omega,
            accel_w1=aw.w1,
            accel_w2=aw.w2,
            unroll=unroll,
        )
        tot_parts.append(tot_u)
    f_final = f
    tot_u = tot_parts[0] if len(tot_parts) == 1 else jnp.concatenate(tot_parts)
    num_free = jnp.asarray((~jnp.asarray(obstacle_mask)).sum(), dtype=f.dtype)
    av_vels = tot_u / num_free
    return f_final, av_vels
