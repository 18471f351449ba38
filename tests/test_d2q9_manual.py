"""Manual-pipeline kernel parity vs the automatic-pipeline Pallas engine
(interpret mode on CPU).

d2q9_pallas_manual reimplements d2q9_pallas.stepk with explicit
double-buffered DMAs; the maths is the same code (d2q9.collide_fields +
the same concat/streaming order), so interpret-mode results must be
bit-identical, and a full simulate must track the pure-JAX engine the same
way the auto kernel does.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.ops import d2q9, d2q9_pallas, d2q9_pallas_manual

RNG = np.random.default_rng(11)


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
    f_man, tots_man = d2q9_pallas_manual.stepk(
        f, mask_f, k_steps=k, accel_row=ny - 2, band=band, **KW)
    assert np.array_equal(np.asarray(f_man), np.asarray(f_auto))
    assert np.array_equal(np.asarray(tots_man), np.asarray(tots_auto))


def test_stepk_scal_plumbing_parity():
    # ghost-extended shard shape: row_offset + valid row/col windows
    ny, nx = 32, 128
    f, mask = make_case(ny, nx)
    mask_f = mask.astype(jnp.float32)
    kw = dict(k_steps=2, accel_row=60, band=8, row_offset=16,
              valid_rows=(4, 28), valid_cols=(8, 120), global_ny=64, **KW)
    f_auto, tots_auto = d2q9_pallas.stepk(f, mask_f, **kw)
    f_man, tots_man = d2q9_pallas_manual.stepk(f, mask_f, **kw)
    assert np.array_equal(np.asarray(f_man), np.asarray(f_auto))
    assert np.array_equal(np.asarray(tots_man), np.asarray(tots_auto))


def test_run_parity():
    # vs the auto kernel at the SAME K: bit-exact (same maths, same order).
    # vs the K=1 jax engine only at k_steps=1 — K-blocked vs single-step
    # results differ by ~1 ulp/step, and the random test state amplifies
    # that chaotically (CLAUDE.md), so cross-K comparison is meaningless.
    ny, nx = 32, 128
    f, mask = make_case(ny, nx)
    mask_f = mask.astype(jnp.float32)
    f_auto, tots_auto = d2q9_pallas.run(
        f, mask_f, num_steps=8, k_steps=4, accel_row=ny - 2, band=8, **KW)
    f_man, tots_man = d2q9_pallas_manual.run(
        f, mask_f, num_steps=8, k_steps=4, accel_row=ny - 2, band=8, **KW)
    assert np.array_equal(np.asarray(f_man), np.asarray(f_auto))
    assert np.array_equal(np.asarray(tots_man), np.asarray(tots_auto))

    amask = d2q9.accel_row_mask(ny, nx, ny - 2)
    f_ref, tots_ref = d2q9.run(f, mask, amask, num_steps=4, **KW)
    f_k1, tots_k1 = d2q9_pallas_manual.run(
        f, mask_f, num_steps=4, k_steps=1, accel_row=ny - 2, band=8, **KW)
    np.testing.assert_allclose(np.asarray(f_k1), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tots_k1), np.asarray(tots_ref),
                               rtol=1e-4)


def test_simulate_reference_semantics():
    p = Params(nx=128, ny=64, max_iters=8, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    f0 = state.initial_distributions(p, np.float32)
    mask = np.zeros((p.ny, p.nx), bool)
    mask[0, :] = True
    _, av_ref = d2q9.simulate(p, f0, mask)
    _, av_man = d2q9_pallas_manual.simulate(p, f0, jnp.asarray(mask),
                                            k_steps=2, band=16)
    np.testing.assert_allclose(np.asarray(av_man), np.asarray(av_ref),
                               rtol=1e-4)


def test_golden_prefix_f32():
    # the reference-data gate the TPU bench applies, on the CPU interpret
    # path: 100-step av_vels prefix vs golden within the f32 floor
    import dataclasses
    import os

    ref = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        pytest.skip("no reference data")
    from lbm_tpu.core.params import Obstacles

    p = Params.from_file(f"{ref}/params/input_128x128.params")
    p = dataclasses.replace(p, max_iters=100)
    obs = Obstacles.from_file(f"{ref}/params/obstacles_128x128.dat", p)
    f0 = state.initial_distributions(p, np.float32)
    _, av = d2q9_pallas_manual.simulate(p, f0, jnp.asarray(obs.mask),
                                        k_steps=4)
    golden = np.loadtxt(f"{ref}/check/128x128.av_vels.dat", usecols=1,
                        max_rows=100)
    rel = np.abs(np.asarray(av, np.float64) - golden) / golden
    assert rel.max() < 1e-3, f"max rel err {rel.max():.3e}"


def test_single_band_rejected():
    f, mask = make_case(8, 128)
    with pytest.raises(ValueError, match=">= 2 bands"):
        d2q9_pallas_manual.stepk(
            f, mask.astype(jnp.float32), k_steps=1, accel_row=6, band=8,
            **KW)


@pytest.mark.parametrize("dtype", ["float64", "bfloat16"])
def test_dtype_parity_with_auto(dtype):
    # f64 is the CPU golden-verification path; bf16 is storage-only
    # (compute in f32) — both must match the auto kernel bit-for-bit
    import jax

    ny, nx, band, k = 32, 128, 8, 2
    with jax.enable_x64(dtype == "float64"):
        f, mask = make_case(ny, nx)
        f = f.astype(dtype)
        assert f.dtype == np.dtype(dtype)
        mask_f = mask.astype(f.dtype)
        f_auto, tots_auto = d2q9_pallas.stepk(
            f, mask_f, k_steps=k, accel_row=ny - 2, band=band, **KW)
        f_man, tots_man = d2q9_pallas_manual.stepk(
            f, mask_f, k_steps=k, accel_row=ny - 2, band=band, **KW)
        assert f_man.dtype == f_auto.dtype == f.dtype
        assert np.array_equal(np.asarray(f_man), np.asarray(f_auto))
        assert np.array_equal(np.asarray(tots_man), np.asarray(tots_auto))


@pytest.mark.parametrize("mode", ["stream_only", "copy"])
def test_diagnostic_modes_match_auto(mode):
    # the d2q9-breakdown attribution modes must mean the same thing on
    # both engines (copy: out = in; stream_only: rolls without collision)
    ny, nx, band, k = 32, 128, 8, 2
    f, mask = make_case(ny, nx)
    mask_f = mask.astype(jnp.float32)
    f_auto, _ = d2q9_pallas.stepk(
        f, mask_f, k_steps=k, accel_row=ny - 2, band=band, mode=mode, **KW)
    f_man, _ = d2q9_pallas_manual.stepk(
        f, mask_f, k_steps=k, accel_row=ny - 2, band=band, mode=mode, **KW)
    assert np.array_equal(np.asarray(f_man), np.asarray(f_auto))


def test_default_band_halves_to_two_bands():
    # 128-row grid: choose_config says band=128 (one band); the explicit
    # pipeline must degrade to 64 rather than reject the default path
    f, mask = make_case(128, 128)
    f_man, _ = d2q9_pallas_manual.stepk(
        f, mask.astype(jnp.float32), k_steps=1, accel_row=126, **KW)
    f_auto, _ = d2q9_pallas.stepk(
        f, mask.astype(jnp.float32), k_steps=1, accel_row=126, band=64, **KW)
    assert np.array_equal(np.asarray(f_man), np.asarray(f_auto))


def test_checkpoint_chunking_bit_exact(tmp_path):
    import os

    from lbm_tpu.models import lbm as lbm_model

    ref = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        pytest.skip("no reference data")
    p = Params.from_file(f"{ref}/params/input_128x128.params")
    from lbm_tpu.core.params import Obstacles

    obs = Obstacles.from_file(f"{ref}/params/obstacles_128x128.dat", p)
    direct = lbm_model.run_simulation(p, obs, engine="pallas-manual",
                                      num_steps=16)
    chunked = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="pallas-manual", num_steps=16, k_steps=4,
        checkpoint_path=tmp_path / "ck.npz", checkpoint_every=8,
    )
    np.testing.assert_array_equal(chunked.av_vels, direct.av_vels)
    np.testing.assert_array_equal(chunked.f_final, direct.f_final)


def test_overlap_results_pin_choose_engine():
    """Pin the committed TPU evidence behind choose_engine: the in-place
    engine's measured MLUPS must beat both two-stream engines on every
    grid where it is recorded. Drift in either the CSV or the selector
    must fail here."""
    import csv
    import os

    from lbm_tpu.ops import d2q9_pallas

    path = os.path.join(os.path.dirname(__file__), "..", "experiments",
                        "d2q9-overlap", "results.csv")
    best = {}
    for r in csv.DictReader(open(path)):
        assert r["platform"] == "tpu", r
        n = int(r["grid"].split("x")[0])
        cur = best.setdefault(n, {})
        # keep each engine's best recorded run (the sweep appends rows)
        cur[r["engine"]] = max(cur.get(r["engine"], 0.0), float(r["mlups"]))
    assert set(best) == {1024, 2048, 4096, 8192}
    for n, engines in best.items():
        assert "inplace" in engines, (n, engines)
        if n > 1280:  # non-resident: in-place dominates outright
            assert engines["inplace"] == max(engines.values()), (n, engines)
        else:  # resident flagship: statistically tied (±3% tunnel
            # variance run to run); in-place must be within 2% of best
            assert engines["inplace"] >= 0.98 * max(engines.values()), \
                (n, engines)
        assert d2q9_pallas.choose_engine(n, n) == "pallas-inplace"
    # the headline wins the bench secondary metrics rely on
    assert best[4096]["inplace"] >= 14000
    assert best[8192]["inplace"] >= 13000
