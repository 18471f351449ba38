"""Analytic physics validation of the LBM engines.

Everything else in the suite validates *numerics* — engine-vs-engine parity
and regression against the reference's golden data (check/*.dat). These tests
validate the *physics* against closed-form Navier-Stokes solutions, entirely
independent of the reference: if the streaming vectors, weights, or BGK
algebra were subtly wrong in a way the golden data happened to tolerate,
these fail.

Covered:
  * viscous shear-wave decay  u_x(y, t) = u0 sin(k y) exp(-nu k^2 t)
    measures the effective kinematic viscosity and compares it with the
    BGK value nu = (1/omega - 1/2)/3 (SURVEY.md cites the reference's
    reynoldsNumber using the equivalent (2/omega - 1)/6 form,
    main/include/LatticeBoltzmannUtils.hpp:202-205);
  * Taylor-Green vortex kinetic-energy decay at rate 2 nu (kx^2 + ky^2);
  * exact conservation laws (mass always; momentum without obstacles;
    mass with bounce-back obstacles);
  * equilibrium is a fixed point of the collision operator.

2-D (D2Q9) and 3-D (D3Q19) engines both run; float64 on CPU so the
measured decay is physics, not rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d2q9, d3q19


def viscosity(omega: float) -> float:
    """BGK kinematic viscosity in lattice units: (1/omega - 1/2)/3."""
    return (1.0 / omega - 0.5) / 3.0


def run_2d(f, steps, omega):
    """Force-free, obstacle-free D2Q9 evolution."""
    ny, nx = f.shape[1:]
    mask = jnp.zeros((ny, nx), bool)
    amask = jnp.zeros((ny, 1), f.dtype)
    return d2q9.run(f, mask, amask, num_steps=steps, omega=omega,
                    accel_w1=0.0, accel_w2=0.0)[0]


def run_3d(f, steps, omega):
    """Force-free, obstacle-free D3Q19 evolution."""
    nz, ny, nx = f.shape[1:]
    mask = jnp.zeros((nz, ny, nx), bool)
    amask = jnp.zeros((nz, 1, 1), f.dtype)
    return d3q19.run(f, mask, amask, num_steps=steps, omega=omega,
                     density=0.1, accel=0.0)[0]


def macroscopic_u(f, e):
    """Velocity components from a state and its (num_speeds, ndim) e-table.

    Components come back in the e-table's column order — (u_y, u_x) for the
    2-D table, (u_z, u_y, u_x) for 3-D.
    """
    rho = jnp.sum(f, axis=0)
    return [
        jnp.tensordot(jnp.asarray(e[:, d], f.dtype), f, axes=1) / rho
        for d in range(e.shape[1])
    ]


@pytest.mark.parametrize("omega", [0.8, 1.25, 1.85])
def test_d2q9_shear_wave_viscosity(omega):
    """Decay of u_x = u0 sin(k y) measures nu to <0.5% of (1/omega-1/2)/3."""
    ny, nx, u0 = 64, 8, 1e-3
    k = 2.0 * np.pi / ny
    with jax.enable_x64(True):
        y = jnp.arange(ny, dtype=jnp.float64)[:, None]
        u_x = u0 * jnp.sin(k * y) * jnp.ones((ny, nx))
        f = d2q9.equilibrium(jnp.ones((ny, nx), jnp.float64), u_x,
                             jnp.zeros((ny, nx), jnp.float64))
        proj = jnp.sin(k * y) * (2.0 / ny)  # Fourier amplitude extractor

        t1, t2 = 100, 300
        f1 = run_2d(f, t1, omega)
        f2 = run_2d(f1, t2 - t1, omega)
        a1 = float(jnp.mean(jnp.sum(macroscopic_u(f1, d2q9_e())[1] * proj, axis=0)))
        a2 = float(jnp.mean(jnp.sum(macroscopic_u(f2, d2q9_e())[1] * proj, axis=0)))

    nu_meas = -np.log(a2 / a1) / (k * k * (t2 - t1))
    nu = viscosity(omega)
    assert abs(nu_meas - nu) / nu < 5e-3, (nu_meas, nu)


def d2q9_e():
    """(9, 2) unit-velocity table as (dy, dx), matching d2q9.stream_pull."""
    from lbm_tpu.core.state import SPEED_VECTORS

    return np.asarray(SPEED_VECTORS)


def d3q19_e():
    """(19, 3) table as (dz, dy, dx)."""
    return np.asarray(d3q19.E)


@pytest.mark.parametrize("omega", [1.0, 1.6])
def test_d2q9_taylor_green_energy_decay(omega):
    """Kinetic energy of a Taylor-Green vortex decays at 2 nu (kx^2+ky^2)."""
    ny = nx = 64
    u0 = 5e-3
    kx = 2.0 * np.pi / nx
    ky = 2.0 * np.pi / ny
    with jax.enable_x64(True):
        y = jnp.arange(ny, dtype=jnp.float64)[:, None]
        x = jnp.arange(nx, dtype=jnp.float64)[None, :]
        u_x = -u0 * jnp.cos(kx * x) * jnp.sin(ky * y)
        u_y = u0 * (kx / ky) * jnp.sin(kx * x) * jnp.cos(ky * y)
        # rho with the O(Ma^2) pressure field of the analytic solution
        rho = 1.0 - 0.75 * u0 * u0 * (jnp.cos(2 * kx * x) + jnp.cos(2 * ky * y))
        f = d2q9.equilibrium(rho, u_x, u_y)

        def energy(f):
            ux, uy = macroscopic_u(f, d2q9_e())
            return float(jnp.sum(ux * ux + uy * uy))

        t1, t2 = 100, 300
        f1 = run_2d(f, t1, omega)
        e1 = energy(f1)
        f2 = run_2d(f1, t2 - t1, omega)
        e2 = energy(f2)

    rate_meas = -np.log(e2 / e1) / (t2 - t1)
    rate = 2.0 * viscosity(omega) * (kx * kx + ky * ky)
    assert abs(rate_meas - rate) / rate < 1e-2, (rate_meas, rate)


@pytest.mark.parametrize("omega", [1.1, 1.9])
def test_d3q19_shear_wave_viscosity(omega):
    """3-D engine: decay of u_x = u0 sin(k z) measures the same BGK nu."""
    nz, ny, nx, u0 = 64, 4, 8, 1e-3
    k = 2.0 * np.pi / nz
    with jax.enable_x64(True):
        z = jnp.arange(nz, dtype=jnp.float64)[:, None, None]
        shape = (nz, ny, nx)
        u_x = u0 * jnp.sin(k * z) * jnp.ones(shape)
        zero = jnp.zeros(shape, jnp.float64)
        f = d3q19.equilibrium(jnp.ones(shape, jnp.float64), u_x, zero, zero)
        proj = jnp.sin(k * z) * (2.0 / nz)

        t1, t2 = 100, 300
        f1 = run_3d(f, t1, omega)
        f2 = run_3d(f1, t2 - t1, omega)
        ex = jnp.asarray(d3q19_e()[:, 2], jnp.float64)

        def amp(f):
            u_x = jnp.tensordot(ex, f, axes=1) / jnp.sum(f, axis=0)
            return float(jnp.mean(jnp.sum(u_x * proj, axis=0)))

        a1, a2 = amp(f1), amp(f2)

    nu_meas = -np.log(a2 / a1) / (k * k * (t2 - t1))
    nu = viscosity(omega)
    assert abs(nu_meas - nu) / nu < 5e-3, (nu_meas, nu)


def test_d2q9_conservation_laws():
    """Force-free evolution conserves mass and momentum to f64 roundoff."""
    ny, nx = 32, 48
    rng = np.random.default_rng(7)
    with jax.enable_x64(True):
        rho = jnp.asarray(1.0 + 0.05 * rng.standard_normal((ny, nx)))
        u_x = jnp.asarray(0.02 * rng.standard_normal((ny, nx)))
        u_y = jnp.asarray(0.02 * rng.standard_normal((ny, nx)))
        f = d2q9.equilibrium(rho, u_x, u_y)
        e = jnp.asarray(d2q9_e(), jnp.float64)

        mass0 = float(jnp.sum(f))
        mom0 = np.asarray(jnp.tensordot(f, e, axes=[[0], [0]]).sum(axis=(0, 1)))
        f2 = run_2d(f, 200, omega=1.5)
        mass1 = float(jnp.sum(f2))
        mom1 = np.asarray(jnp.tensordot(f2, e, axes=[[0], [0]]).sum(axis=(0, 1)))

    assert abs(mass1 - mass0) / mass0 < 1e-12
    np.testing.assert_allclose(mom1, mom0, atol=1e-11 * mass0)


def test_d2q9_mass_conserved_with_obstacles():
    """Bounce-back obstacles exchange momentum with walls but conserve mass."""
    ny, nx = 32, 32
    rng = np.random.default_rng(3)
    with jax.enable_x64(True):
        rho = jnp.asarray(1.0 + 0.05 * rng.standard_normal((ny, nx)))
        u_x = jnp.asarray(0.02 * rng.standard_normal((ny, nx)))
        u_y = jnp.asarray(0.02 * rng.standard_normal((ny, nx)))
        f = d2q9.equilibrium(rho, u_x, u_y)
        mask = jnp.zeros((ny, nx), bool).at[10:14, 6:20].set(True).at[0, :].set(True)
        amask = jnp.zeros((ny, 1), jnp.float64)
        mass0 = float(jnp.sum(f))
        f2 = d2q9.run(f, mask, amask, num_steps=200, omega=1.5,
                      accel_w1=0.0, accel_w2=0.0)[0]
        mass1 = float(jnp.sum(f2))
    assert abs(mass1 - mass0) / mass0 < 1e-12


def test_d3q19_conservation_laws():
    nz, ny, nx = 16, 16, 32
    rng = np.random.default_rng(11)
    with jax.enable_x64(True):
        shape = (nz, ny, nx)
        rho = jnp.asarray(1.0 + 0.05 * rng.standard_normal(shape))
        u = [jnp.asarray(0.02 * rng.standard_normal(shape)) for _ in range(3)]
        f = d3q19.equilibrium(rho, u[0], u[1], u[2])
        e = jnp.asarray(d3q19_e(), jnp.float64)

        mass0 = float(jnp.sum(f))
        mom0 = np.asarray(jnp.tensordot(f, e, axes=[[0], [0]]).sum(axis=(0, 1, 2)))
        f2 = run_3d(f, 100, omega=1.5)
        mass1 = float(jnp.sum(f2))
        mom1 = np.asarray(jnp.tensordot(f2, e, axes=[[0], [0]]).sum(axis=(0, 1, 2)))

    assert abs(mass1 - mass0) / mass0 < 1e-12
    np.testing.assert_allclose(mom1, mom0, atol=1e-11 * mass0)


def test_d2q9_equilibrium_is_collision_fixed_point():
    """collide_fields maps an equilibrium state to itself (modulo fp)."""
    ny, nx = 16, 24
    rng = np.random.default_rng(5)
    with jax.enable_x64(True):
        rho = jnp.asarray(1.0 + 0.1 * rng.standard_normal((ny, nx)))
        u_x = jnp.asarray(0.05 * rng.standard_normal((ny, nx)))
        u_y = jnp.asarray(0.05 * rng.standard_normal((ny, nx)))
        f = d2q9.equilibrium(rho, u_x, u_y)
        mask = jnp.zeros((ny, nx), bool)
        amask = jnp.zeros((ny, 1), jnp.float64)
        f_new, _ = d2q9.collide_fields(
            tuple(f), mask, amask, omega=1.7, accel_w1=0.0, accel_w2=0.0)
        np.testing.assert_allclose(np.asarray(f_new), np.asarray(f),
                                   rtol=0, atol=1e-14)


def test_d3q19_equilibrium_is_collision_fixed_point():
    shape = (8, 12, 16)
    rng = np.random.default_rng(9)
    with jax.enable_x64(True):
        rho = jnp.asarray(1.0 + 0.1 * rng.standard_normal(shape))
        u = [jnp.asarray(0.05 * rng.standard_normal(shape)) for _ in range(3)]
        f = d3q19.equilibrium(rho, u[0], u[1], u[2])
        mask = jnp.zeros(shape, bool)
        amask = jnp.zeros((shape[0], 1, 1), jnp.float64)
        f_new, _ = d3q19.collide_fields(
            list(f), mask, amask, omega=1.7, density=0.1, accel=0.0)
        np.testing.assert_allclose(np.asarray(f_new), np.asarray(f),
                                   rtol=0, atol=1e-14)


def test_d2q9_equilibrium_at_rest_matches_initial_distributions():
    """At u=0 the equilibrium reduces to the reference's w0/w1/w2 init."""
    from lbm_tpu.core import state
    from lbm_tpu.core.params import Params

    p = Params(nx=12, ny=8, max_iters=1, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    with jax.enable_x64(True):
        zero = jnp.zeros((p.ny, p.nx), jnp.float64)
        feq = d2q9.equilibrium(jnp.full((p.ny, p.nx), 0.1, jnp.float64),
                               zero, zero)
        np.testing.assert_allclose(
            np.asarray(feq), state.initial_distributions(p, np.float64),
            rtol=1e-15)
