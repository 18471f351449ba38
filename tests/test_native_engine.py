"""Tests for the native serial D2Q9 engine (native/d2q9_serial.cpp).

The native engine is the framework's independent host-side oracle — the
analogue of the reference's serial golden standard (main/LastChance.cpp).
It must match the golden data at f64, agree with the JAX engine in both
precisions, and be bit-identically chunkable (the checkpoint contract).
"""

import dataclasses
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core import io, state
from lbm_tpu.core.params import Obstacles, Params
from lbm_tpu.ops import d2q9, d2q9_native

pytestmark = pytest.mark.skipif(
    not d2q9_native.available(),
    reason="native engine not built and no toolchain available")


def load_case(reference_dir, grid="128x128", n=100):
    p = Params.from_file(f"{reference_dir}/params/input_{grid}.params")
    obs = Obstacles.from_file(f"{reference_dir}/params/obstacles_{grid}.dat", p)
    return dataclasses.replace(p, max_iters=n), obs


def test_f64_matches_golden_prefix(reference_dir):
    p, obs = load_case(reference_dir, n=500)
    golden = io.read_av_vels(f"{reference_dir}/check/128x128.av_vels.dat")
    f0 = state.initial_distributions(p, np.float64)
    _, av = d2q9_native.simulate(p, f0, obs.mask)
    rel = np.abs(av - golden[:500]) / golden[:500]
    assert rel.max() < 1e-10, f"max rel err {rel.max():.3e}"


def test_f64_agrees_with_jax_engine(reference_dir):
    p, obs = load_case(reference_dir, n=100)
    f0 = state.initial_distributions(p, np.float64)
    fn, avn = d2q9_native.simulate(p, f0.copy(), obs.mask)
    with jax.enable_x64(True):
        fj, avj = d2q9.simulate(p, jnp.asarray(f0), jnp.asarray(obs.mask))
        fj, avj = np.asarray(fj), np.asarray(avj)
    np.testing.assert_allclose(avn, avj, rtol=1e-12)
    np.testing.assert_allclose(fn, fj, rtol=1e-11, atol=1e-16)


def test_f32_agrees_with_jax_engine(reference_dir):
    """Same expression grouping => same rounding class; the residual is
    reduction order (~1e-6/step scale, experiments/f32-error-decomposition)."""
    p, obs = load_case(reference_dir, n=100)
    f0 = state.initial_distributions(p, np.float32)
    fn, avn = d2q9_native.simulate(p, f0.copy(), obs.mask)
    fj, avj = d2q9.simulate(p, jnp.asarray(f0), jnp.asarray(obs.mask))
    np.testing.assert_allclose(avn, np.asarray(avj, np.float64), rtol=1e-4)
    np.testing.assert_allclose(fn, np.asarray(fj), rtol=2e-4, atol=1e-9)


def test_chunked_runs_bit_identical(reference_dir):
    p, obs = load_case(reference_dir, n=40)
    aw = d2q9.AccelWeights.from_params(p)
    row = p.ny - 2
    f_one = state.initial_distributions(p, np.float64)
    f_chunk = f_one.copy()
    tot_one = d2q9_native.run(f_one, obs.mask, num_steps=40, omega=p.omega,
                              accel_w1=aw.w1, accel_w2=aw.w2, accel_row=row)
    tots = [d2q9_native.run(f_chunk, obs.mask, num_steps=10, omega=p.omega,
                            accel_w1=aw.w1, accel_w2=aw.w2, accel_row=row)
            for _ in range(4)]
    assert np.array_equal(np.concatenate(tots), tot_one)
    assert np.array_equal(f_chunk, f_one)


def test_first_accelerate_guard_matches_jax(reference_dir):
    """The positivity guard must trip per cell exactly like the JAX path."""
    p, obs = load_case(reference_dir, n=1)
    rng = np.random.default_rng(0)
    f0 = state.initial_distributions(p, np.float64)
    # perturb so some cells fail the positivity guard
    f0[3, p.ny - 2, ::3] = 1e-6
    f0[6, p.ny - 2, 1::5] = 1e-7
    aw = d2q9.AccelWeights.from_params(p)
    f_native = f0.copy()
    d2q9_native.first_accelerate(f_native, obs.mask, accel_row=p.ny - 2,
                                 accel_w1=aw.w1, accel_w2=aw.w2)
    with jax.enable_x64(True):
        f_jax = np.asarray(d2q9.first_accelerate(
            jnp.asarray(f0), jnp.asarray(obs.mask), accel_row=p.ny - 2,
            accel_w1=aw.w1, accel_w2=aw.w2))
    assert np.array_equal(f_native, f_jax)


def test_cli_engine_native(reference_dir, tmp_path):
    ref = Path(reference_dir)
    cmd = [sys.executable, "-m", "lbm_tpu.cli.lbm",
           "--params", str(ref / "params/input_128x128.params"),
           "--obstacles", str(ref / "params/obstacles_128x128.dat"),
           "--engine", "native", "--dtype", "float64",
           "--num-steps", "50", "--out-dir", str(tmp_path)]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=Path(__file__).parent.parent, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "==done==" in out.stdout
    av = io.read_av_vels(tmp_path / "av_vels.dat")
    golden = io.read_av_vels(f"{reference_dir}/check/128x128.av_vels.dat")
    rel = np.abs(av - golden[:50]) / golden[:50]
    assert rel.max() < 1e-10


def test_checkpoint_chunking_native(reference_dir, tmp_path):
    """--checkpoint-every chunked native run == uninterrupted native run."""
    from lbm_tpu.models import lbm as lbm_model

    p, obs = load_case(reference_dir, n=30)
    straight = lbm_model.run_simulation(p, obs, dtype=jnp.float64,
                                        engine="native")
    chunked = lbm_model.run_simulation_with_checkpoints(
        p, obs, checkpoint_path=tmp_path / "ck.npz", checkpoint_every=10,
        dtype=jnp.float64, engine="native")
    assert np.array_equal(chunked.av_vels, straight.av_vels)
    assert np.array_equal(chunked.f_final, straight.f_final)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomised_state_parity_with_jax(seed):
    """Equilibrium + 1% perturbation + random obstacles (random raw states
    are chaotic and useless for cross-engine comparison — CLAUDE.md): the
    native and JAX engines must agree step-for-step at f64."""
    rng = np.random.default_rng(seed)
    ny, nx = 24, 40
    rho = 0.1 * (1 + 0.01 * rng.standard_normal((ny, nx)))
    u_x = 0.01 * rng.standard_normal((ny, nx))
    u_y = 0.01 * rng.standard_normal((ny, nx))
    with jax.enable_x64(True):
        f0 = np.asarray(d2q9.equilibrium(jnp.asarray(rho), jnp.asarray(u_x),
                                         jnp.asarray(u_y)), np.float64)
    mask = rng.random((ny, nx)) < 0.1
    mask[ny - 2] = False  # keep the accelerated row free
    omega, w1, w2 = 1.85, 1e-4, 2.5e-5
    f_nat = f0.copy()  # run() advances in place
    tot_nat = d2q9_native.run(f_nat, mask, num_steps=20, omega=omega,
                              accel_w1=w1, accel_w2=w2, accel_row=ny - 2)
    with jax.enable_x64(True):
        amask = d2q9.accel_row_mask(ny, nx, ny - 2, dtype=jnp.float64)
        f_jax, tot_jax = d2q9.run(jnp.asarray(f0), jnp.asarray(mask), amask,
                                  num_steps=20, omega=omega, accel_w1=w1,
                                  accel_w2=w2)
    np.testing.assert_allclose(tot_nat, np.asarray(tot_jax), rtol=1e-12)
    np.testing.assert_allclose(f_nat, np.asarray(f_jax), rtol=1e-10,
                               atol=1e-18)


# ---------------------------------------------------------------------------
# Native serial D3Q19 oracle (native/d3q19_serial.cpp)
# ---------------------------------------------------------------------------

from lbm_tpu.ops import d3q19, d3q19_native  # noqa: E402


needs_3d = pytest.mark.skipif(not d3q19_native.available(),
                              reason="native 3-D engine not built")


@needs_3d
def test_3d_f64_matches_jax_and_golden_anchor():
    """The native engine must match the JAX f64 engine AND the committed
    f64 golden trace (tests/data/d3q19_16x16x32_200.av_vels.dat)."""
    import os

    fn, avn = d3q19_native.simulate(16, 16, 32, num_steps=200,
                                    dtype=np.float64)
    with jax.enable_x64(True):
        fj, avj = d3q19.simulate(16, 16, 32, num_steps=200, dtype=np.float64)
    np.testing.assert_allclose(avn, np.asarray(avj), rtol=1e-12)
    np.testing.assert_allclose(fn, np.asarray(fj), rtol=1e-11, atol=1e-18)
    golden = np.loadtxt(os.path.join(os.path.dirname(__file__), "data",
                                     "d3q19_16x16x32_200.av_vels.dat"),
                        usecols=1, delimiter="\t")
    np.testing.assert_allclose(avn[1:], golden[1:], rtol=1e-12)


@needs_3d
def test_3d_f32_same_rounding_class_as_jax():
    _, avn = d3q19_native.simulate(8, 12, 16, num_steps=50, dtype=np.float32)
    _, avj = d3q19.simulate(8, 12, 16, num_steps=50, dtype=np.float32)
    np.testing.assert_allclose(avn, np.asarray(avj, np.float64), rtol=2e-4,
                               atol=1e-9)


@needs_3d
def test_3d_obstacle_geometry_parity():
    """Random interior obstacle block exercises the 19-speed bounce-back."""
    mask = np.zeros((8, 12, 16), bool)
    mask[0] = mask[-1] = True
    mask[3:5, 4:7, 6:10] = True
    fn, avn = d3q19_native.simulate(8, 12, 16, num_steps=30,
                                    obstacle_mask=mask, dtype=np.float64)
    with jax.enable_x64(True):
        fj, avj = d3q19.simulate(8, 12, 16, num_steps=30, obstacle_mask=mask,
                                 dtype=np.float64)
    np.testing.assert_allclose(avn, np.asarray(avj), rtol=1e-12)
    np.testing.assert_allclose(fn, np.asarray(fj), rtol=1e-11, atol=1e-18)


@needs_3d
def test_3d_cli_engine_native(tmp_path):
    cmd = [sys.executable, "-m", "lbm_tpu.cli.lbm3d", "--nz", "8", "--ny",
           "8", "--nx", "16", "-n", "5", "--engine", "native",
           "--out-dir", str(tmp_path)]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=Path(__file__).parent.parent, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "av_vels_3d.dat").exists()
