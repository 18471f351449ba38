"""In-place (aliased) kernel parity vs the automatic-pipeline Pallas engine
(interpret mode on CPU).

d2q9_pallas_inplace reimplements d2q9_pallas_manual.stepk with the output
written back into the input lattice (input_output_aliases) plus the two
orderings that makes necessary: the delayed write-back (band bi-1 flushes
only after band bi's halo fetch) and the wraparound snapshot (the last
band's bottom halo reads rows [0, 8) as they were BEFORE band 0's in-place
write). Interpret mode executes DMAs in program order — one legal schedule
of the hardware's — so bit-parity with the auto kernel here is a real test
of that ordering logic, including the snapshot path (every case has a last
band).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core.params import Params
from lbm_tpu.ops import d2q9, d2q9_pallas, d2q9_pallas_inplace

RNG = np.random.default_rng(13)


def make_case(ny, nx):
    f = RNG.uniform(0.01, 1.0, size=(9, ny, nx)).astype(np.float32)
    mask = np.zeros((ny, nx), bool)
    mask[ny // 4: ny // 2, nx // 4: nx // 2] = True
    mask[0, :] = True
    return jnp.asarray(f), jnp.asarray(mask)


KW = dict(omega=1.85, accel_w1=0.1 * 0.005 / 9, accel_w2=0.1 * 0.005 / 36)


@pytest.mark.parametrize("ny,nx,band,k", [
    (16, 128, 8, 1),
    (64, 128, 16, 2),
    (64, 256, 16, 4),
    (32, 128, 16, 8),
])
def test_stepk_bitwise_parity_with_auto(ny, nx, band, k):
    f, mask = make_case(ny, nx)
    mask_f = mask.astype(jnp.float32)
    f_auto, tots_auto = d2q9_pallas.stepk(
        f, mask_f, k_steps=k, accel_row=ny - 2, band=band, **KW)
    f_ip, tots_ip = d2q9_pallas_inplace.stepk(
        f, mask_f, k_steps=k, accel_row=ny - 2, band=band, **KW)
    assert np.array_equal(np.asarray(f_ip), np.asarray(f_auto))
    assert np.array_equal(np.asarray(tots_ip), np.asarray(tots_auto))


def test_input_not_mutated_outside_jit():
    """JAX functional semantics must survive the aliasing: an eagerly
    passed array is copied, never destroyed."""
    f, mask = make_case(32, 128)
    before = np.asarray(f).copy()
    d2q9_pallas_inplace.stepk(
        f, mask.astype(jnp.float32), k_steps=2, accel_row=30, band=16, **KW)
    np.testing.assert_array_equal(np.asarray(f), before)


def test_two_band_minimum_and_wraparound():
    # nb == 2 exercises the tightest pipeline (epilogue drains both bands)
    # AND the snapshot (band 1's bottom halo wraps to band 0's rows)
    f, mask = make_case(16, 128)
    mask_f = mask.astype(jnp.float32)
    f_auto, _ = d2q9_pallas.stepk(
        f, mask_f, k_steps=2, accel_row=14, band=8, **KW)
    f_ip, _ = d2q9_pallas_inplace.stepk(
        f, mask_f, k_steps=2, accel_row=14, band=8, **KW)
    assert np.array_equal(np.asarray(f_ip), np.asarray(f_auto))


def test_run_matches_jax_engine():
    ny, nx = 64, 128
    f, mask = make_case(ny, nx)
    # equilibrium-ish state: stable over the scan
    f = jnp.full((9, ny, nx), 0.1 / 9, jnp.float32) + 0.001 * f
    amask = d2q9.accel_row_mask(ny, nx, ny - 2)
    f_ref, tots_ref = d2q9.run(f, mask, amask, num_steps=16, **KW)
    f_ip, tots_ip = d2q9_pallas_inplace.run(
        f, mask.astype(jnp.float32), num_steps=16, k_steps=4,
        accel_row=ny - 2, band=16, **KW)
    np.testing.assert_allclose(np.asarray(f_ip), np.asarray(f_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tots_ip), np.asarray(tots_ref),
                               rtol=1e-4, atol=1e-3)


def test_scal_plumbing_parity():
    # ghost-extended shard shape: row_offset + valid row/col windows
    ny, nx = 32, 128
    f, mask = make_case(ny, nx)
    mask_f = mask.astype(jnp.float32)
    kw = dict(k_steps=2, accel_row=60, band=8, row_offset=16,
              valid_rows=(4, 28), valid_cols=(8, 120), global_ny=64, **KW)
    f_auto, tots_auto = d2q9_pallas.stepk(f, mask_f, **kw)
    f_ip, tots_ip = d2q9_pallas_inplace.stepk(f, mask_f, **kw)
    assert np.array_equal(np.asarray(f_ip), np.asarray(f_auto))
    assert np.array_equal(np.asarray(tots_ip), np.asarray(tots_auto))


@pytest.mark.parametrize("mode", ["copy", "stream_only"])
def test_diagnostic_modes_match_auto(mode):
    ny, nx, band, k = 32, 128, 8, 2
    f, mask = make_case(ny, nx)
    mask_f = mask.astype(jnp.float32)
    f_auto, _ = d2q9_pallas.stepk(
        f, mask_f, k_steps=k, accel_row=ny - 2, band=band, mode=mode, **KW)
    f_ip, _ = d2q9_pallas_inplace.stepk(
        f, mask_f, k_steps=k, accel_row=ny - 2, band=band, mode=mode, **KW)
    assert np.array_equal(np.asarray(f_ip), np.asarray(f_auto))


def test_choose_config_measured_table():
    """Pin the measured v5e optima (experiments/d2q9-overlap/results.csv):
    resident grids keep K=4 at the resident band; non-resident grids take
    the wide large-grid band with SHALLOW blocking — K=2 at band >= 64,
    K=4 at narrower bands (in-place aliasing makes copy cheap enough that
    deep K's halo recompute no longer pays)."""
    assert d2q9_pallas_inplace.choose_config(1024, 1024) == (128, 4)
    assert d2q9_pallas_inplace.choose_config(2048, 2048) == (128, 2)
    assert d2q9_pallas_inplace.choose_config(4096, 4096) == (64, 2)
    assert d2q9_pallas_inplace.choose_config(8192, 8192) == (32, 4)


def test_choose_engine_is_inplace_everywhere():
    """In-place won at EVERY measured size (results.csv: 12,114 / 14,238 /
    15,186 / 14,369 MLUPS vs the auto pipeline's 11,886 / 11,377 / 11,606
    / 10,548)."""
    for n in (128, 1024, 1408, 4096, 8192):
        assert d2q9_pallas.choose_engine(n, n) == "pallas-inplace"


def test_default_band_rules():
    # resident grid -> resident band; non-resident -> wide band at every K
    f, mask = make_case(16, 128)
    mask_f = mask.astype(jnp.float32)
    # default band on a tiny grid degrades to >= 2 bands instead of failing
    f_ip, _ = d2q9_pallas_inplace.stepk(
        f, mask_f, k_steps=1, accel_row=14, **KW)
    f_auto, _ = d2q9_pallas.stepk(
        f, mask_f, k_steps=1, accel_row=14, band=8, **KW)
    assert np.array_equal(np.asarray(f_ip), np.asarray(f_auto))


def test_simulate_golden_prefix():
    import os

    ref = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        pytest.skip("no reference data")
    from lbm_tpu.core import io, state
    from lbm_tpu.core.params import Obstacles

    p = Params.from_file(f"{ref}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{ref}/params/obstacles_128x128.dat", p)
    import dataclasses

    p = dataclasses.replace(p, max_iters=100)
    f0 = jnp.asarray(state.initial_distributions(p, np.float32))
    _, av = d2q9_pallas_inplace.simulate(p, f0, jnp.asarray(obs.mask))
    golden = io.read_av_vels(f"{ref}/check/128x128.av_vels.dat")[:100]
    rel = np.abs(np.asarray(av, np.float64) - golden) / golden
    assert rel.max() < 4e-4, rel.max()


def test_checkpoint_chunking_bit_exact(tmp_path):
    import os

    from lbm_tpu.models import lbm as lbm_model

    ref = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        pytest.skip("no reference data")
    from lbm_tpu.core.params import Obstacles

    p = Params.from_file(f"{ref}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{ref}/params/obstacles_128x128.dat", p)
    direct = lbm_model.run_simulation(p, obs, engine="pallas-inplace",
                                      num_steps=16)
    chunked = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="pallas-inplace", num_steps=16, k_steps=4,
        checkpoint_path=tmp_path / "ck.npz", checkpoint_every=8,
    )
    np.testing.assert_array_equal(chunked.av_vels, direct.av_vels)
    np.testing.assert_array_equal(chunked.f_final, direct.f_final)


def test_model_auto_engine_resolves_to_inplace():
    import os

    from lbm_tpu.models import lbm as lbm_model

    ref = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        pytest.skip("no reference data")
    from lbm_tpu.core.params import Obstacles

    p = Params.from_file(f"{ref}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{ref}/params/obstacles_128x128.dat", p)
    auto = lbm_model.run_simulation(p, obs, engine="auto", num_steps=8)
    explicit = lbm_model.run_simulation(p, obs, engine="pallas-inplace",
                                        num_steps=8)
    np.testing.assert_array_equal(auto.av_vels, explicit.av_vels)
    np.testing.assert_array_equal(auto.f_final, explicit.f_final)


def test_choose_engine_degenerate_heights():
    """Feasibility overrides the ranking (round-4 advisor fix): the
    in-place pipeline needs >= 2 multiple-of-8 bands, so ny=8 routes to
    the two-stream 'pallas' engine and non-multiple-of-8 heights to
    'jax' instead of a downstream ValueError."""
    assert d2q9_pallas.choose_engine(8, 128) == "pallas"
    assert d2q9_pallas.choose_engine(12, 128) == "jax"
    assert d2q9_pallas.choose_engine(16, 128) == "pallas-inplace"


def test_simulate_rejects_infeasible_height_early():
    import dataclasses

    p = Params(nx=128, ny=8, max_iters=4, reynolds_dim=128,
               density=0.1, accel=0.005, omega=1.85)
    f = jnp.asarray(np.full((9, 8, 128), 0.1 / 9, np.float32))
    mask = jnp.zeros((8, 128), bool)
    with pytest.raises(ValueError, match="in-place engine needs ny"):
        d2q9_pallas_inplace.simulate(p, f, mask)
    p12 = dataclasses.replace(p, ny=12)
    with pytest.raises(ValueError, match="in-place engine needs ny"):
        d2q9_pallas_inplace.simulate(
            p12, jnp.asarray(np.full((9, 12, 128), 0.1 / 9, np.float32)),
            jnp.zeros((12, 128), bool))


def test_all_valid_reduction_matches_windowed():
    """The single-chip static fast path (all_valid: the Sum|u| reduction
    drops its ghost-exclusion `where`) must be bit-identical to the same
    call with an explicit full-grid valid window, which routes through
    the windowed reduction (round-4 VERDICT #1's kept piece — the accel
    band-specialization half measured a ~32% LOSS and was reverted, see
    experiments/d2q9-overlap/regress_probe.csv)."""
    ny, nx, band, k = 64, 128, 8, 4
    f, mask = make_case(ny, nx)
    mask_f = mask.astype(jnp.float32)
    kw = dict(k_steps=k, accel_row=ny - 2, band=band, **KW)
    f_fast, tots_fast = d2q9_pallas_inplace.stepk(f, mask_f, **kw)
    # jax Array bounds (concrete, but not Python ints) fail _static_eq's
    # isinstance(int) check -> defeats the static all_valid detection
    f_win, tots_win = d2q9_pallas_inplace.stepk(
        f, mask_f, valid_rows=(jnp.int32(0), jnp.int32(ny)), **kw)
    assert np.array_equal(np.asarray(f_fast), np.asarray(f_win))
    assert np.array_equal(np.asarray(tots_fast), np.asarray(tots_win))
