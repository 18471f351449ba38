"""Pallas D3Q19 kernel parity vs the pure-JAX 3-D engine (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d3q19, d3q19_pallas


def make_case(nz, ny, nx):
    rng = np.random.default_rng(31)
    f = d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32)
    f *= (1.0 + 0.01 * rng.uniform(-1, 1, size=f.shape)).astype(np.float32)
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = True
    mask[nz // 2, ny // 3 : ny // 2, nx // 4 : nx // 2] = True
    return f, mask


@pytest.mark.parametrize("k_steps,bz", [(1, 2), (2, 2), (4, 4)])
def test_stepk_matches_reference(k_steps, bz):
    nz, ny, nx = 8, 16, 128
    f, mask = make_case(nz, ny, nx)
    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)

    f_ref = jnp.asarray(f)
    tots_ref = []
    for _ in range(k_steps):
        f_ref, t = d3q19.step(f_ref, jnp.asarray(mask), amask,
                              omega=1.85, density=0.1, accel=0.005)
        tots_ref.append(float(t))

    f_pl, tots = d3q19_pallas.stepk(
        jnp.asarray(f), jnp.asarray(mask, np.float32), k_steps=k_steps,
        omega=1.85, density=0.1, accel=0.005, accel_plane=nz - 2, bz=bz,
    )
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tots), tots_ref, rtol=1e-4)


def test_run_scan_parity():
    nz, ny, nx = 8, 8, 128
    f, mask = make_case(nz, ny, nx)
    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)
    f_ref, tots_ref = d3q19.run(jnp.asarray(f), jnp.asarray(mask), amask,
                                num_steps=4, omega=1.85, density=0.1,
                                accel=0.005)
    f_pl, tots = d3q19_pallas.run(
        jnp.asarray(f), jnp.asarray(mask, np.float32), num_steps=4,
        k_steps=2, omega=1.85, density=0.1, accel=0.005,
        accel_plane=nz - 2, bz=2,
    )
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tots), np.asarray(tots_ref), rtol=1e-4)


def test_rejects_bad_k():
    f = jnp.zeros((19, 8, 8, 128), jnp.float32)
    with pytest.raises(ValueError, match="k_steps"):
        d3q19_pallas.stepk(f, jnp.zeros((8, 8, 128)), k_steps=3, omega=1.85,
                           density=0.1, accel=0.005, accel_plane=6, bz=4)


@pytest.mark.parametrize("seed", [0, 1] + [pytest.param(s, marks=pytest.mark.slow) for s in (2, 3)])
def test_random_3d_config_parity(seed):
    rng = np.random.default_rng(500 + seed)
    nz = 2 * int(rng.integers(2, 7))
    ny = 8 * int(rng.integers(1, 4))
    nx = 128
    k = int(rng.choice([1, 2]))
    bzs = [b for b in (2, 4) if nz % b == 0 and b % k == 0]
    if not bzs:
        k, bzs = 1, [b for b in (1, 2) if nz % b == 0]
    bz = int(rng.choice(bzs))
    steps = k * int(rng.integers(1, 3))
    omega = float(rng.uniform(0.8, 1.9))

    f = d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32)
    f *= (1.0 + 0.02 * rng.uniform(-1, 1, size=f.shape)).astype(np.float32)
    mask = rng.uniform(size=(nz, ny, nx)) < 0.08
    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)

    f_ref = jnp.asarray(f)
    for _ in range(steps):
        f_ref, _ = d3q19.step(f_ref, jnp.asarray(mask), amask,
                              omega=omega, density=0.1, accel=0.005)

    f_pl, _ = d3q19_pallas.run(
        jnp.asarray(f), jnp.asarray(mask, np.float32), num_steps=steps,
        k_steps=k, omega=omega, density=0.1, accel=0.005,
        accel_plane=nz - 2, bz=bz,
    )
    np.testing.assert_allclose(
        np.asarray(f_pl), np.asarray(f_ref), rtol=2e-4, atol=1e-6,
        err_msg=f"nz={nz} ny={ny} bz={bz} k={k} steps={steps}",
    )


def test_zmajor_layout_matches_qmajor():
    """The contiguous-DMA z-major layout computes identical physics (the
    public API stays q-major; transposes happen at the scan boundary)."""
    import jax.numpy as jnp

    nz, ny, nx = 8, 16, 128
    f = jnp.asarray(d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32))
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = True
    mask[-1] = True
    mask_f = jnp.asarray(mask).astype(f.dtype)
    kw = dict(num_steps=2, k_steps=2, omega=1.85, density=0.1, accel=0.005,
              accel_plane=nz - 2, bz=2)
    f_q, t_q = d3q19_pallas.run(f, mask_f, **kw)
    f_z, t_z = d3q19_pallas.run(f, mask_f, layout="zmajor", **kw)
    np.testing.assert_allclose(np.asarray(f_z), np.asarray(f_q),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t_z), np.asarray(t_q), rtol=1e-6)


@pytest.mark.parametrize("cfg", [
    (8, 16, 128, 2, 8, 2),
    # the K=4 big-block case costs ~70 s of CPU interpret for the same
    # code path -> slow suite
    pytest.param((8, 32, 128, 4, 16, 4), marks=pytest.mark.slow),
    (8, 16, 128, 4, 8, 1),
])
def test_blocked_zy_kernel_matches_slab(cfg):
    """The (z,y)-blocked kernel (small-block DMA regime) computes the same
    physics as the z-slab kernel; Sum|u| partials may differ by reduction
    order only."""
    import jax.numpy as jnp

    nz, ny, nx, bz, by, k = cfg
    f = jnp.asarray(d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32))
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = True
    mask[-1] = True
    mask_f = jnp.asarray(mask).astype(f.dtype)
    kw = dict(num_steps=2 * k, k_steps=k, omega=1.85, density=0.1,
              accel=0.005, accel_plane=nz - 2)
    f_q, t_q = d3q19_pallas.run(f, mask_f, bz=bz, **kw)
    f_b, t_b = d3q19_pallas.run(f, mask_f, bz=bz, by=by, **kw)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_q),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_q), rtol=1e-4)


def test_choose_config_slab_when_it_fits():
    """Production shapes keep the measured-fastest z-slab config."""
    assert d3q19_pallas.choose_config(64, 128, 256, 2) == (4, None)
    assert d3q19_pallas.choose_config(128, 128, 128, 2) == (4, None)
    assert d3q19_pallas.choose_config(8, 8, 16, 2) == (4, None)


def test_choose_config_blocks_large_planes():
    """256x256+ planes exceed the slab's VMEM (measured FAILED rows in
    experiments/lbm3d-perf/sizes.csv) -> the (z,y)-blocked kernel with a
    legal by (divides ny, multiple of 8)."""
    for nz, ny, nx in [(32, 256, 256), (128, 256, 256), (128, 512, 512)]:
        bz, by = d3q19_pallas.choose_config(nz, ny, nx, 2)
        assert by is not None and ny % by == 0 and by % 8 == 0
        assert nz % bz == 0 and bz % 2 == 0


def test_choose_config_raises_when_no_block_fits_budget():
    """When even the smallest legal y-block exceeds the VMEM budget the
    config chooser must raise the descriptive error up front, not hand back
    a config that dies later as an opaque Mosaic compile failure."""
    with pytest.raises(ValueError, match="VMEM budget"):
        d3q19_pallas.choose_config(4, 8, 8192, 2)


def test_stepk_rejects_bz_not_multiple_of_k():
    """bz % k_steps != 0 misaligns the K-plane halo BlockSpecs (silently
    wrong physics before this guard)."""
    f = jnp.zeros((19, 6, 8, 128), jnp.float32)
    with pytest.raises(ValueError,
                       match="multiple of k_steps|divide nz and bz"):
        d3q19_pallas.stepk(f, jnp.zeros((6, 8, 128)), k_steps=2, omega=1.85,
                           density=0.1, accel=0.005, accel_plane=4, bz=3)


def test_simulate_pallas_uses_auto_config_on_blocked_shape():
    """simulate(engine='pallas') must run (interpret mode here) at a shape
    whose slab config would exceed TPU VMEM."""
    nz, ny, nx = 8, 16, 128
    import lbm_tpu.ops.d3q19_pallas as mod
    orig = mod.choose_config
    try:
        mod.choose_config = lambda *a, **k: (4, 8)  # force the blocked path
        f, av = d3q19.simulate(nz, ny, nx, num_steps=4, engine="pallas")
    finally:
        mod.choose_config = orig
    f2, av2 = d3q19.simulate(nz, ny, nx, num_steps=4, engine="jax")
    np.testing.assert_allclose(np.asarray(av), np.asarray(av2),
                               rtol=1e-5, atol=1e-9)
