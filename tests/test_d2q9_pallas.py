"""Pallas fused-kernel parity vs the pure-JAX engine (interpret mode on CPU).

The analogue of running reference codelets on poplar CPUDevice
(test/codelets/main.cpp) — kernel logic validated off-hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.ops import d2q9, d2q9_pallas

RNG = np.random.default_rng(7)


def make_case(ny, nx):
    f = RNG.uniform(0.01, 1.0, size=(9, ny, nx)).astype(np.float32)
    mask = np.zeros((ny, nx), bool)
    mask[ny // 4 : ny // 2, nx // 4 : nx // 2] = True
    mask[0, :] = True
    return jnp.asarray(f), jnp.asarray(mask)


@pytest.mark.parametrize("ny,nx,band", [(16, 128, 8), (64, 128, 16), (64, 256, 64)])
def test_step_parity(ny, nx, band):
    f, mask = make_case(ny, nx)
    amask = d2q9.accel_row_mask(ny, nx, ny - 2)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    f_ref, tot_ref = d2q9.step(f, mask, amask, omega=1.85, accel_w1=w1, accel_w2=w2)
    f_pl, tot_pl = d2q9_pallas.step(
        f, mask.astype(jnp.float32), omega=1.85, accel_w1=w1, accel_w2=w2,
        accel_row=ny - 2, band=band,
    )
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(tot_pl), float(tot_ref), rtol=1e-4)


def test_single_band_wraps_to_itself():
    # H == band: both halo blocks come from the same (only) band
    f, mask = make_case(8, 128)
    amask = d2q9.accel_row_mask(8, 128, 6)
    f_ref, _ = d2q9.step(f, mask, amask, omega=1.85, accel_w1=0.001, accel_w2=0.0005)
    f_pl, _ = d2q9_pallas.step(
        f, mask.astype(jnp.float32), omega=1.85, accel_w1=0.001, accel_w2=0.0005,
        accel_row=6, band=8,
    )
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref), rtol=1e-4, atol=1e-6)


def test_run_multi_step_parity():
    f, mask = make_case(32, 128)
    amask = d2q9.accel_row_mask(32, 128, 30)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    f_ref, tots_ref = d2q9.run(f, mask, amask, num_steps=5, omega=1.85,
                               accel_w1=w1, accel_w2=w2)
    f_pl, tots_pl = d2q9_pallas.run(f, mask.astype(jnp.float32), num_steps=5,
                                    omega=1.85, accel_w1=w1, accel_w2=w2,
                                    accel_row=30, band=8)
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tots_pl), np.asarray(tots_ref), rtol=1e-4)


def test_simulate_golden_prefix(reference_dir):
    """Pallas engine reproduces the golden av_vels prefix in f32."""
    import dataclasses

    from lbm_tpu.core import io
    from lbm_tpu.core.params import Obstacles

    p = Params.from_file(f"{reference_dir}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{reference_dir}/params/obstacles_128x128.dat", p)
    golden = io.read_av_vels(f"{reference_dir}/check/128x128.av_vels.dat")
    n = 20
    p_n = dataclasses.replace(p, max_iters=n)
    f0 = jnp.asarray(state.initial_distributions(p_n, np.float32))
    _, av = d2q9_pallas.simulate(p_n, f0, jnp.asarray(obs.mask))
    rel = np.abs(np.asarray(av, np.float64) - golden[:n]) / golden[:n]
    assert rel.max() < 1e-4


def test_choose_band():
    assert d2q9_pallas.choose_band(1024, 1024) % 8 == 0
    assert 1024 % d2q9_pallas.choose_band(1024, 1024) == 0
    assert d2q9_pallas.choose_band(8, 128) == 8


def test_choose_band_matches_measured_optima():
    """The budget rule must reproduce the per-width optima measured on v5e
    (experiments/min-band-size + large-grid sweep2048/4096/8192 CSVs)."""
    assert d2q9_pallas.choose_band(1024, 1024) == 128
    assert d2q9_pallas.choose_band(2048, 2048) == 64
    assert d2q9_pallas.choose_band(4096, 4096) == 32
    assert d2q9_pallas.choose_band(8192, 8192) == 16


def test_choose_config_regime_rules():
    """The regime rules behind choose_config (the per-size optima table
    itself is pinned by tests/test_large_grid_results.py against the
    committed CSV): resident grids stay K=4; non-resident grids take K=8
    ONLY when the 50 MB budget actually widens the band — at an
    un-widened band K=8's halo recompute loses (sweepk8.csv: 8192^2
    band 16 K=8 is 8,689 vs 9,696 MLUPS at K=4)."""
    # small/test grids and the flagship stay in the resident K=4 regime;
    # the boundary is the MEASURED cliff between 1280^2 and 1408^2
    # (experiments/residency-cliff: K=4 drops 10,894 -> 8,601 MLUPS)
    assert d2q9_pallas.choose_config(128, 128)[1] == 4
    assert d2q9_pallas.choose_config(1024, 1024)[1] == 4
    assert d2q9_pallas.choose_config(1280, 1280)[1] == 4
    assert d2q9_pallas.choose_config(1408, 1408) == (128, 8)
    # non-resident, band widens -> K=8 at the wider band
    band4 = d2q9_pallas.choose_band(4096, 4096)
    band8, k8 = d2q9_pallas.choose_config(4096, 4096)
    assert (k8, band8 > band4) == (8, True)
    # non-resident but the budget cannot widen the band -> fall back to
    # K=4 rather than ship the measured-slower narrow-band K=8
    wide = (2048, 16384)
    assert d2q9_pallas.choose_band(*wide, 50 * 1024 * 1024) == \
        d2q9_pallas.choose_band(*wide)
    assert d2q9_pallas.choose_config(*wide)[1] == 4
