"""In-place blocked (z, y) 3-D kernel parity vs the automatic blocked
engine (interpret mode on CPU).

d3q19_pallas_inplace_blocked extends the aliased one-HBM-stream scheme to
the (z, y)-blocked decomposition used when planes exceed the slab kernel's
VMEM (256x256-plane shapes): per-block explicit DMA pipeline over a 5-D
(19, nz, nby, by, nx) view (Mosaic memref_slice cannot take dynamic
offsets on tiled dims, so y-blocks are an untiled index), row-granular
delayed flush, and a wraparound snapshot of planes [0, k). Interpret mode
executes DMAs in program order, so bit-parity with the automatic blocked
kernel exercises the ordering logic."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import (d3q19, d3q19_pallas, d3q19_pallas_inplace,
                         d3q19_pallas_inplace_blocked as blk)

RNG = np.random.default_rng(23)
KW = dict(omega=1.85, density=0.1, accel=0.005)


def make_case(nz, ny, nx):
    f = (0.1 / 19 + 0.001 * RNG.random((19, nz, ny, nx))).astype(np.float32)
    mask = np.zeros((nz, ny, nx), np.float32)
    mask[0] = 1.0
    mask[-1] = 1.0
    return jnp.asarray(f), jnp.asarray(mask)


@pytest.mark.parametrize("nz,ny,nx,bz,by,k", [
    (8, 16, 128, 4, 8, 1),
    (8, 16, 128, 4, 8, 2),
    (16, 32, 128, 4, 8, 2),   # 4 z-rows x 4 y-blocks
    (8, 16, 128, 2, 8, 2),    # k == bz
])
def test_stepk_bitwise_parity_with_auto_blocked(nz, ny, nx, bz, by, k):
    f, mask_f = make_case(nz, ny, nx)
    fa, ta = d3q19_pallas.stepk(
        f, mask_f, k_steps=k, accel_plane=nz - 2, bz=bz, by=by, **KW)
    fi, ti = blk.stepk(
        f, mask_f, k_steps=k, accel_plane=nz - 2, bz=bz, by=by, **KW)
    assert np.array_equal(np.asarray(fi), np.asarray(fa))
    assert np.array_equal(np.asarray(ti), np.asarray(ta))


def test_k3_matches_jax_engine():
    # K=3 has no auto-kernel counterpart (it needs k | bz); the in-place
    # engines only need k <= bz. K=3 is the production TPU config at the
    # bench shape (6,386 MLUPS vs 5,131 at K=2 — lbm3d-perf/inplace.csv).
    nz, ny, nx = 8, 16, 128
    f, mask_f = make_case(nz, ny, nx)
    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)
    f_ref, tots_ref = d3q19.run(f, mask_f != 0, amask, num_steps=3, **KW)
    fb, tb = blk.stepk(f, mask_f, k_steps=3, accel_plane=nz - 2,
                       bz=4, by=8, **KW)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(f_ref),
                               rtol=0, atol=2e-6)
    fs, ts = d3q19_pallas_inplace.stepk(
        f, mask_f, k_steps=3, accel_plane=nz - 2, bz=4, **KW)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(f_ref),
                               rtol=0, atol=2e-6)


def test_input_not_mutated_outside_jit():
    f, mask_f = make_case(8, 16, 128)
    before = np.asarray(f).copy()
    blk.stepk(f, mask_f, k_steps=2, accel_plane=6, bz=4, by=8, **KW)
    np.testing.assert_array_equal(np.asarray(f), before)


def test_run_matches_jax_engine():
    nz, ny, nx = 8, 16, 128
    f, mask_f = make_case(nz, ny, nx)
    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)
    f_ref, tots_ref = d3q19.run(f, mask_f != 0, amask, num_steps=8, **KW)
    f_ip, tots_ip = blk.run(f, mask_f, num_steps=8, k_steps=2, bz=4, by=8,
                            accel_plane=nz - 2, **KW)
    np.testing.assert_allclose(np.asarray(f_ip), np.asarray(f_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tots_ip), np.asarray(tots_ref),
                               rtol=1e-4, atol=1e-3)


def test_scal_plumbing_parity():
    # ghost-extended z-shard block: plane_offset + valid plane window
    nz, ny, nx = 8, 16, 128
    f, mask_f = make_case(nz, ny, nx)
    kw = dict(k_steps=2, accel_plane=13, bz=4, by=8, plane_offset=4,
              valid_planes=(2, 6), global_nz=16, **KW)
    fa, ta = d3q19_pallas.stepk(f, mask_f, **kw)
    fi, ti = blk.stepk(f, mask_f, **kw)
    assert np.array_equal(np.asarray(fi), np.asarray(fa))
    assert np.array_equal(np.asarray(ti), np.asarray(ta))


def test_copy_mode_roundtrips():
    nz, ny, nx = 8, 16, 128
    f, mask_f = make_case(nz, ny, nx)
    f_ip, _ = blk.stepk(f, mask_f, k_steps=2, accel_plane=nz - 2,
                        bz=4, by=8, mode="copy", **KW)
    np.testing.assert_array_equal(np.asarray(f_ip), np.asarray(f))


def test_rejects_bad_configs():
    f, mask_f = make_case(8, 16, 128)
    with pytest.raises(ValueError, match=">= 2 z-rows"):
        blk.stepk(f, mask_f, k_steps=2, accel_plane=6, bz=8, by=8, **KW)
    with pytest.raises(ValueError, match="exceed bz"):
        blk.stepk(f, mask_f, k_steps=4, accel_plane=6, bz=2, by=8, **KW)
    with pytest.raises(ValueError, match="multiple of 8"):
        blk.stepk(f, mask_f, k_steps=2, accel_plane=6, bz=4, by=4, **KW)


def test_pick_engine_regimes():
    # TPU-calibrated: slab where its live set fits, blocked beyond
    assert blk.pick_engine(64, 128, 256, 2)[0] == "slab"
    assert blk.pick_engine(128, 128, 128, 2)[0] == "slab"
    assert blk.pick_engine(64, 128, 256, 3)[0] == "slab"
    kind, bz, by = blk.pick_engine(32, 256, 256, 2)
    assert kind == "blocked" and by is not None
    assert blk.pick_engine(128, 256, 256, 2)[0] == "blocked"


def test_choose_k_production_configs():
    # bench shape: slab K=3 (6,386 vs 5,131 MLUPS at K=2 — inplace.csv)
    assert blk.choose_k(64, 128, 256, 600) == ("slab", 4, None, 3)
    # 256^2-plane shapes: blocked, largest y-block in budget (by=64 beat
    # by=32 4,436 vs 3,870 at K=3 on TPU probes; 4,417/4,792 in the CSV)
    assert blk.choose_k(32, 256, 256, 600) == ("blocked", 4, 64, 3)
    assert blk.choose_k(128, 256, 256, 600) == ("blocked", 4, 64, 3)
    # K honoured as an upper bound; step counts gate divisibility
    assert blk.choose_k(64, 128, 256, 600, max_k=2)[3] == 2
    assert blk.choose_k(64, 128, 256, 100)[3] == 2   # 100 % 3 != 0
    # prime nz still works: K=1 slab at bz=1 is always feasible for
    # VMEM-fitting planes
    assert blk.choose_k(7, 16, 128, 5, max_k=2) == ("slab", 1, None, 1)
    # infeasible everywhere (prime nz forces bz=1, and a 4096^2 plane's
    # blocked output ring alone exceeds VMEM) -> descriptive error
    with pytest.raises(ValueError, match="no in-place config"):
        blk.choose_k(7, 4096, 4096, 5)


def test_simulate_routes_blocked_shapes():
    # a 256x256-plane shape through the public engine dispatch: slab
    # infeasible, must route to the blocked kernel (interpret mode) and
    # match the jax engine
    nz, ny, nx = 4, 256, 256
    f_ip, av_ip = d3q19.simulate(nz, ny, nx, num_steps=2,
                                 engine="pallas-inplace", k_steps=2)
    f_jx, av_jx = d3q19.simulate(nz, ny, nx, num_steps=2, engine="jax")
    np.testing.assert_allclose(np.asarray(av_ip), np.asarray(av_jx),
                               rtol=1e-4, atol=1e-7)
