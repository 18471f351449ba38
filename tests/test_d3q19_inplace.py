"""In-place (aliased) 3-D kernel parity vs the automatic z-slab engine
(interpret mode on CPU).

d3q19_pallas_inplace applies the d2q9-overlap finding (two HBM streams cap
at ~290-320 GB/s, the aliased stream at ~523) to the z-slab D3Q19 kernel:
explicit 2-slot DMA pipeline, delayed write-back, wraparound snapshot of
planes [0, k). Interpret mode executes DMAs in program order, so
bit-parity with the automatic kernel exercises the ordering logic."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d3q19, d3q19_pallas, d3q19_pallas_inplace

RNG = np.random.default_rng(17)
KW = dict(omega=1.85, density=0.1, accel=0.005)


def make_case(nz, ny, nx):
    f = (0.1 / 19 + 0.001 * RNG.random((19, nz, ny, nx))).astype(np.float32)
    mask = np.zeros((nz, ny, nx), np.float32)
    mask[0] = 1.0
    mask[-1] = 1.0
    return jnp.asarray(f), jnp.asarray(mask)


@pytest.mark.parametrize("nz,ny,nx,bz,k", [
    (8, 8, 128, 4, 1),
    (8, 8, 128, 4, 2),
    (16, 8, 128, 4, 4),
    (4, 8, 128, 2, 2),   # two-slab minimum + k == bz
])
def test_stepk_bitwise_parity_with_auto(nz, ny, nx, bz, k):
    f, mask_f = make_case(nz, ny, nx)
    fa, ta = d3q19_pallas.stepk(
        f, mask_f, k_steps=k, accel_plane=nz - 2, bz=bz, **KW)
    fi, ti = d3q19_pallas_inplace.stepk(
        f, mask_f, k_steps=k, accel_plane=nz - 2, bz=bz, **KW)
    assert np.array_equal(np.asarray(fi), np.asarray(fa))
    assert np.array_equal(np.asarray(ti), np.asarray(ta))


def test_input_not_mutated_outside_jit():
    f, mask_f = make_case(8, 8, 128)
    before = np.asarray(f).copy()
    d3q19_pallas_inplace.stepk(
        f, mask_f, k_steps=2, accel_plane=6, bz=4, **KW)
    np.testing.assert_array_equal(np.asarray(f), before)


def test_run_matches_jax_engine():
    nz, ny, nx = 8, 8, 128
    f, mask_f = make_case(nz, ny, nx)
    mask = mask_f != 0
    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)
    f_ref, tots_ref = d3q19.run(f, mask, amask, num_steps=8, **KW)
    f_ip, tots_ip = d3q19_pallas_inplace.run(
        f, mask_f, num_steps=8, k_steps=2, bz=4, accel_plane=nz - 2, **KW)
    np.testing.assert_allclose(np.asarray(f_ip), np.asarray(f_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tots_ip), np.asarray(tots_ref),
                               rtol=1e-4, atol=1e-3)


def test_scal_plumbing_parity():
    # ghost-extended z-shard block: plane_offset + valid plane window
    nz, ny, nx = 8, 8, 128
    f, mask_f = make_case(nz, ny, nx)
    kw = dict(k_steps=2, accel_plane=13, bz=4, plane_offset=4,
              valid_planes=(2, 6), global_nz=16, **KW)
    fa, ta = d3q19_pallas.stepk(f, mask_f, **kw)
    fi, ti = d3q19_pallas_inplace.stepk(f, mask_f, **kw)
    assert np.array_equal(np.asarray(fi), np.asarray(fa))
    assert np.array_equal(np.asarray(ti), np.asarray(ta))


@pytest.mark.parametrize("mode", ["copy", "stream_only"])
def test_diagnostic_modes_run(mode):
    nz, ny, nx = 8, 8, 128
    f, mask_f = make_case(nz, ny, nx)
    f_ip, _ = d3q19_pallas_inplace.stepk(
        f, mask_f, k_steps=2, accel_plane=nz - 2, bz=4, mode=mode, **KW)
    if mode == "copy":
        np.testing.assert_array_equal(np.asarray(f_ip), np.asarray(f))
    else:
        fa, _ = d3q19_pallas.stepk(
            f, mask_f, k_steps=2, accel_plane=nz - 2, bz=4, mode=mode, **KW)
        assert np.array_equal(np.asarray(f_ip), np.asarray(fa))


def test_rejects_single_slab_and_oversized_k():
    f, mask_f = make_case(8, 8, 128)
    with pytest.raises(ValueError, match=">= 2 slabs"):
        d3q19_pallas_inplace.stepk(
            f, mask_f, k_steps=2, accel_plane=6, bz=8, **KW)
    with pytest.raises(ValueError, match="exceed bz"):
        d3q19_pallas_inplace.stepk(
            f, mask_f, k_steps=4, accel_plane=6, bz=2, **KW)


def test_simulate_engine_dispatch():
    nz, ny, nx = 8, 8, 128
    f_ip, av_ip = d3q19.simulate(nz, ny, nx, num_steps=4,
                                 engine="pallas-inplace", k_steps=2)
    f_jax, av_jax = d3q19.simulate(nz, ny, nx, num_steps=4, engine="jax")
    np.testing.assert_allclose(np.asarray(av_ip), np.asarray(av_jax),
                               rtol=1e-4, atol=1e-7)


def test_checkpoint_chunking_bit_exact(tmp_path):
    from lbm_tpu.models import lbm3d

    nz, ny, nx = 8, 8, 128
    direct = d3q19.simulate(nz, ny, nx, num_steps=8,
                            engine="pallas-inplace", k_steps=2)
    f_ck, av_ck, _, _ = lbm3d.run_simulation_with_checkpoints(
        nz, ny, nx, num_steps=8, checkpoint_every=4, k_steps=2,
        engine="pallas-inplace", checkpoint_path=tmp_path / "ck3d.npz",
    )
    np.testing.assert_array_equal(np.asarray(f_ck), np.asarray(direct[0]))
    np.testing.assert_array_equal(np.asarray(av_ck, np.float64),
                                  np.asarray(direct[1], np.float64))


def test_default_bz_lands_feasible_on_awkward_nz():
    """Round-4 advisor fix: nz=6 at k_steps=3 used to halve the default
    bz down to 2 (< K) and raise; the nz % k fallback now lands bz=3."""
    f, mask_f = make_case(6, 8, 128)
    fd, td = d3q19_pallas_inplace.stepk(
        f, mask_f, k_steps=3, accel_plane=4, **KW)  # bz=None default
    fe, te = d3q19_pallas_inplace.stepk(
        f, mask_f, k_steps=3, accel_plane=4, bz=3, **KW)
    assert np.array_equal(np.asarray(fd), np.asarray(fe))
    assert np.array_equal(np.asarray(td), np.asarray(te))


def test_simulate_rejects_infeasible_explicit_k():
    """Round-4 advisor fix: an explicit k_steps that choose_k cannot honour
    raises instead of silently benchmarking at a shallower K."""
    with pytest.raises(ValueError, match="no feasible in-place config"):
        d3q19.simulate(8, 8, 128, num_steps=4,
                       engine="pallas-inplace", k_steps=3)
