"""Kernel-level D2Q9 tests on tiny literal lattices.

These mirror the reference's codelet unit-test spec (test/codelets/main.cpp):
propagate for all 9 speeds incl. wraparound, rebound speed-swap, accelerate
guard semantics, collision vs an independent textbook-equilibrium
reimplementation, and the masked average-velocity reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.ops import d2q9

RNG = np.random.default_rng(42)


def rand_f(ny, nx, dtype=np.float32):
    return (RNG.uniform(0.01, 1.0, size=(9, ny, nx))).astype(dtype)


def np_stream_pull(f):
    """Independent numpy pull-streaming: s_k(x) = f_k(x - e_k), periodic."""
    out = np.empty_like(f)
    for k, (dy, dx) in enumerate(state.SPEED_VECTORS):
        out[k] = np.roll(f[k], (dy, dx), axis=(0, 1))
    return out


class TestStreaming:
    def test_all_nine_speeds_periodic(self):
        f = rand_f(5, 7)
        s = jnp.stack(d2q9.stream_pull(jnp.asarray(f)))
        np.testing.assert_array_equal(np.asarray(s), np_stream_pull(f))

    def test_single_marker_moves_with_velocity(self):
        # a marked cell's speed-k population must arrive at cell + e_k
        for k, (dy, dx) in enumerate(state.SPEED_VECTORS):
            f = np.zeros((9, 4, 4), np.float32)
            f[k, 1, 2] = 7.0
            s = np.asarray(jnp.stack(d2q9.stream_pull(jnp.asarray(f))))
            assert s[k, (1 + dy) % 4, (2 + dx) % 4] == 7.0
            assert s.sum() == 7.0

    def test_corner_wraparound(self):
        # NE speed leaving the top-right corner arrives at the bottom-left
        f = np.zeros((9, 3, 3), np.float32)
        f[5, 2, 2] = 1.0  # speed 5 = NE
        s = np.asarray(jnp.stack(d2q9.stream_pull(jnp.asarray(f))))
        assert s[5, 0, 0] == 1.0


class TestRebound:
    def test_obstacle_cell_swaps_opposite_speeds(self):
        f = rand_f(3, 3)
        mask = np.zeros((3, 3), bool)
        mask[1, 1] = True
        amask = jnp.zeros((3, 1), jnp.float32)
        f_new, _ = d2q9.collide(
            tuple(jnp.asarray(f)), jnp.asarray(mask), amask,
            omega=1.85, accel_w1=0.0, accel_w2=0.0,
        )
        f_new = np.asarray(f_new)
        # obstacle cell: new[k] = streamed[opposite[k]] — but here we fed the
        # planes directly as "streamed" values, so check the swap wiring.
        for k in range(9):
            assert f_new[k, 1, 1] == f[state.OPPOSITE[k], 1, 1]

    def test_obstacle_cells_excluded_from_tot_u(self):
        f = rand_f(3, 3)
        all_blocked = np.ones((3, 3), bool)
        amask = jnp.zeros((3, 1), jnp.float32)
        _, tot_u = d2q9.collide(
            tuple(jnp.asarray(f)), jnp.asarray(all_blocked), amask,
            omega=1.85, accel_w1=0.0, accel_w2=0.0,
        )
        assert float(tot_u) == 0.0


class TestCollision:
    def test_matches_textbook_equilibrium(self):
        """The rearranged algebra (main/LastChance.cpp:236-251) must equal the
        textbook BGK d_equ form to float64 round-off."""
        with jax.enable_x64(True):
            f = rand_f(4, 4, np.float64)
            omega = 1.85
            mask = np.zeros((4, 4), bool)
            amask = jnp.zeros((4, 1), jnp.float64)
            f_new, _ = d2q9.collide(
                tuple(jnp.asarray(f)), jnp.asarray(mask), amask,
                omega=omega, accel_w1=0.0, accel_w2=0.0,
            )
            f_new = np.asarray(f_new)

        # independent textbook reimplementation
        rho = f.sum(axis=0)
        ex = state.SPEED_VECTORS[:, 1][:, None, None]
        ey = state.SPEED_VECTORS[:, 0][:, None, None]
        u_x = (f * ex).sum(axis=0) / rho
        u_y = (f * ey).sum(axis=0) / rho
        u_sq = u_x**2 + u_y**2
        w = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)[:, None, None]
        eu = ex * u_x + ey * u_y
        d_equ = w * rho * (1 + 3 * eu + 4.5 * eu**2 - 1.5 * u_sq)
        expected = f + omega * (d_equ - f)
        np.testing.assert_allclose(f_new, expected, rtol=1e-12, atol=1e-14)

    def test_density_and_momentum_conserved(self):
        with jax.enable_x64(True):
            f = rand_f(4, 4, np.float64)
            mask = np.zeros((4, 4), bool)
            amask = jnp.zeros((4, 1), jnp.float64)
            f_new, _ = d2q9.collide(
                tuple(jnp.asarray(f)), jnp.asarray(mask), amask,
                omega=1.85, accel_w1=0.0, accel_w2=0.0,
            )
            f_new = np.asarray(f_new)
        np.testing.assert_allclose(f_new.sum(axis=0), f.sum(axis=0), rtol=1e-12)
        ex = state.SPEED_VECTORS[:, 1][:, None, None]
        np.testing.assert_allclose(
            (f_new * ex).sum(axis=0), (f * ex).sum(axis=0), rtol=1e-11, atol=1e-15
        )


class TestAccelerate:
    params = Params(nx=4, ny=4, max_iters=1, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)

    def test_first_accelerate_modifies_target_row(self):
        f = jnp.asarray(state.initial_distributions(self.params, np.float32))
        mask = jnp.zeros((4, 4), bool)
        w1 = 0.1 * 0.005 / 9
        w2 = 0.1 * 0.005 / 36
        f2 = np.asarray(
            d2q9.first_accelerate(f, mask, accel_row=2, accel_w1=w1, accel_w2=w2)
        )
        np.testing.assert_allclose(f2[1, 2], 0.1 / 9 + w1, rtol=1e-6)
        np.testing.assert_allclose(f2[3, 2], 0.1 / 9 - w1, rtol=1e-6)
        np.testing.assert_allclose(f2[5, 2], 0.1 / 36 + w2, rtol=1e-6)
        np.testing.assert_allclose(f2[7, 2], 0.1 / 36 - w2, rtol=1e-6)
        # untouched rows and speeds
        np.testing.assert_array_equal(f2[:, 0], np.asarray(f)[:, 0])
        np.testing.assert_array_equal(f2[0, 2], np.asarray(f)[0, 2])

    def test_negative_density_guard(self):
        """Cells whose west-side densities would go negative are skipped
        (reference: main/LastChance.cpp:169-172)."""
        f = np.asarray(state.initial_distributions(self.params, np.float32))
        f[3, 2, 1] = 1e-9  # west density too small at (row 2, col 1)
        mask = jnp.zeros((4, 4), bool)
        f2 = np.asarray(
            d2q9.first_accelerate(jnp.asarray(f), mask, accel_row=2,
                                  accel_w1=0.1 * 0.005 / 9, accel_w2=0.1 * 0.005 / 36)
        )
        np.testing.assert_array_equal(f2[:, 2, 1], f[:, 2, 1])  # guarded cell
        assert f2[1, 2, 0] > f[1, 2, 0]  # neighbour still accelerated

    def test_obstacle_skip(self):
        f = state.initial_distributions(self.params, np.float32)
        mask = np.zeros((4, 4), bool)
        mask[2, 3] = True
        f2 = np.asarray(
            d2q9.first_accelerate(jnp.asarray(f), jnp.asarray(mask), accel_row=2,
                                  accel_w1=0.1 * 0.005 / 9, accel_w2=0.1 * 0.005 / 36)
        )
        np.testing.assert_array_equal(f2[:, 2, 3], f[:, 2, 3])

    def test_in_step_accel_row_applied_unguarded(self):
        """Inside the fused step the force has no positivity guard
        (main/LastChance.cpp:198, :253-261)."""
        f = jnp.asarray(state.initial_distributions(self.params, np.float32))
        mask = jnp.zeros((4, 4), bool)
        amask = d2q9.accel_row_mask(4, 4, 2)
        f_acc, _ = d2q9.step(f, mask, amask, omega=1.85,
                             accel_w1=0.1 * 0.005 / 9, accel_w2=0.1 * 0.005 / 36)
        f_no, _ = d2q9.step(f, mask, jnp.zeros_like(amask), omega=1.85,
                            accel_w1=0.1 * 0.005 / 9, accel_w2=0.1 * 0.005 / 36)
        f_acc, f_no = np.asarray(f_acc), np.asarray(f_no)
        np.testing.assert_allclose(f_acc[1, 2] - f_no[1, 2], 0.1 * 0.005 / 9, rtol=1e-4)
        np.testing.assert_array_equal(f_acc[:, 0], f_no[:, 0])


class TestAverageVelocity:
    def test_masked_reduction_matches_host(self):
        """The in-step tot_u equals the host-side average_velocity recomputed
        on the streamed state (4-stage pipeline analogue,
        test/codelets/main.cpp:236-404)."""
        with jax.enable_x64(True):
            f = rand_f(6, 6, np.float64)
            mask = np.zeros((6, 6), bool)
            mask[2, 3] = mask[0, 0] = True
            amask = jnp.zeros((6, 1), jnp.float64)
            _, tot_u = d2q9.step(jnp.asarray(f), jnp.asarray(mask), amask,
                                 omega=1.85, accel_w1=0.0, accel_w2=0.0)
            streamed = np_stream_pull(f)
            expected = state.average_velocity(streamed, mask) * (~mask).sum()
            np.testing.assert_allclose(float(tot_u), expected, rtol=1e-12)


class TestRun:
    def test_scan_equals_python_loop(self):
        p = Params(nx=8, ny=8, max_iters=5, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
        f = jnp.asarray(state.initial_distributions(p, np.float32))
        mask = jnp.zeros((8, 8), bool)
        amask = d2q9.accel_row_mask(8, 8, 6)
        w1, w2 = d2q9.AccelWeights.from_params(p)
        f_scan, tot = d2q9.run(f, mask, amask, num_steps=5, omega=p.omega,
                               accel_w1=w1, accel_w2=w2)
        f_loop = f
        touts = []
        for _ in range(5):
            f_loop, t = d2q9.step(f_loop, mask, amask, omega=p.omega,
                                  accel_w1=w1, accel_w2=w2)
            touts.append(float(t))
        # scan vs unrolled compile differently; allow f32 fusion-order noise
        np.testing.assert_allclose(np.asarray(f_scan), np.asarray(f_loop), rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(tot), touts, rtol=1e-4)

    def test_total_density_conserved_without_accel(self):
        p = Params(nx=16, ny=16, max_iters=50, reynolds_dim=10,
                   density=0.1, accel=0.0, omega=1.85)
        f0 = state.initial_distributions(p, np.float32)
        mask = np.zeros((16, 16), bool)
        mask[3:5, 3:5] = True
        f_final, _ = d2q9.simulate(p, jnp.asarray(f0), jnp.asarray(mask))
        np.testing.assert_allclose(
            state.total_density(np.asarray(f_final)), state.total_density(f0), rtol=1e-5
        )


def test_crash_fence_chunks():
    """The 8192^2 TPU-worker crash fence (experiments/large-grid/
    crash_repro_8192.py): long single-dispatch scans at >= 8192^2 cells on
    TPU are split into <= CRASH_FENCE_STEPS dispatches; smaller grids,
    short runs and non-TPU backends are untouched."""
    import os

    from lbm_tpu.ops.d2q9 import (CRASH_FENCE_CELLS, CRASH_FENCE_STEPS,
                                  _fence_chunks)

    big = CRASH_FENCE_CELLS
    # ceil(2000/496) = 5 dispatches, evenly balanced under the 496 cap
    assert _fence_chunks(2000, big, "tpu") == [400, 400, 400, 400, 400]
    chunks = _fence_chunks(2001, big, "tpu")
    assert sum(chunks) == 2001 and max(chunks) <= CRASH_FENCE_STEPS
    assert _fence_chunks(496, big, "tpu") == [496]
    assert _fence_chunks(2000, big - 1, "tpu") == [2000]
    assert _fence_chunks(2000, big, "cpu") == [2000]
    os.environ["LBM_UNFENCED_SCAN"] = "1"
    try:
        assert _fence_chunks(2000, big, "tpu") == [2000]
    finally:
        del os.environ["LBM_UNFENCED_SCAN"]
