"""D3Q19 engine tests: lattice wiring, conservation, physics sanity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d3q19

RNG = np.random.default_rng(19)


def test_lattice_constants():
    assert d3q19.E.shape == (19, 3)
    assert abs(d3q19.W.sum() - 1.0) < 1e-12
    # opposite speeds really are opposite
    for k in range(19):
        np.testing.assert_array_equal(d3q19.E[d3q19.OPPOSITE[k]], -d3q19.E[k])
    # isotropy: sum w_i e_ia e_ib = (1/3) delta_ab
    m = (d3q19.W[:, None, None] * d3q19.E[:, :, None] * d3q19.E[:, None, :]).sum(0)
    np.testing.assert_allclose(m, np.eye(3) / 3, atol=1e-12)


def test_streaming_moves_marker():
    f = np.zeros((19, 4, 4, 4), np.float32)
    for k in range(1, 19):
        f[:] = 0
        f[k, 1, 2, 3] = 5.0
        s = d3q19.stream_pull(jnp.asarray(f))
        dz, dy, dx = d3q19.E[k]
        assert float(s[k][(1 + dz) % 4, (2 + dy) % 4, (3 + dx) % 4]) == 5.0


def test_equilibrium_is_stationary():
    """A uniform zero-velocity state is a fixed point (no accel)."""
    with jax.enable_x64(True):
        f = jnp.asarray(d3q19.initial_distributions(4, 4, 8, 0.1, np.float64))
        mask = jnp.zeros((4, 4, 8), bool)
        amask = jnp.zeros((4, 1, 1), jnp.float64)
        f2, tot = d3q19.step(f, mask, amask, omega=1.85, density=0.1, accel=0.0)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f), rtol=1e-12)
    assert float(tot) < 1e-12  # |u| is sqrt of ~1e-34 rounding noise


def test_mass_and_momentum_conserved():
    f = RNG.uniform(0.01, 1.0, size=(19, 4, 6, 8)).astype(np.float64)
    with jax.enable_x64(True):
        mask = jnp.zeros((4, 6, 8), bool)
        amask = jnp.zeros((4, 1, 1), jnp.float64)
        f2, _ = d3q19.step(jnp.asarray(f), mask, amask,
                           omega=1.85, density=0.1, accel=0.0)
    f2 = np.asarray(f2)
    np.testing.assert_allclose(f2.sum(), f.sum(), rtol=1e-12)
    for axis_idx in range(3):
        e = d3q19.E[:, axis_idx][:, None, None, None]
        np.testing.assert_allclose(
            (f2 * e).sum(), (f * e).sum(), rtol=1e-9, atol=1e-12
        )


def test_rebound_on_obstacles():
    f = RNG.uniform(0.01, 1.0, size=(19, 3, 3, 3)).astype(np.float32)
    mask = np.ones((3, 3, 3), bool)
    amask = jnp.zeros((3, 1, 1), jnp.float32)
    f2, tot = d3q19.step(jnp.asarray(f), jnp.asarray(mask), amask,
                         omega=1.85, density=0.1, accel=0.0)
    f2 = np.asarray(f2)
    s = np.stack([np.asarray(x) for x in d3q19.stream_pull(jnp.asarray(f))])
    for k in range(19):
        np.testing.assert_array_equal(f2[k], s[d3q19.OPPOSITE[k]])
    assert float(tot) == 0.0


def test_simulate_develops_flow():
    """The accelerated plane drives increasing mean velocity, no NaNs."""
    f_final, av = d3q19.simulate(8, 8, 16, num_steps=50)
    av = np.asarray(av)
    assert np.all(np.isfinite(av))
    # step 1 measures u before the first force application -> av[0] == 0
    assert av[-1] > av[5] > 0
    assert np.all(np.isfinite(np.asarray(f_final)))


def test_sharded_engine_matches_jax():
    """The (z,y)-sharded implicit 3-D engine reproduces the single-device
    run (the 3-D multi-chip path; 8-virtual-device CPU mesh)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    f_ref, av_ref = d3q19.simulate(16, 16, 32, num_steps=20)
    f_sh, av_sh = d3q19.simulate(16, 16, 32, num_steps=20, engine="sharded",
                                 num_devices=8)
    np.testing.assert_allclose(np.asarray(av_sh), np.asarray(av_ref),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("configs", [
    ((4, 2),),
    pytest.param(((8, 2), (2, 4)), marks=pytest.mark.slow),
])
def test_ghost_plane_pallas_sharded_matches_jax(configs):
    """The communication-avoiding 3-D path (ghost planes + local K-step
    Pallas kernel) reproduces the single-device run."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    nz, ny, nx = 16, 16, 128
    f_ref, av_ref = d3q19.simulate(nz, ny, nx, num_steps=8)
    for n_shards, k in configs:
        mesh = pallas_sharded_3d.make_z_mesh(n_shards)
        f_sh, av_sh = pallas_sharded_3d.simulate(
            nz, ny, nx, num_steps=8, mesh=mesh, k_steps=k)
        np.testing.assert_allclose(np.asarray(av_sh), np.asarray(av_ref),
                                   rtol=2e-5, err_msg=f"shards={n_shards} k={k}")
        np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                                   rtol=2e-5, atol=1e-7,
                                   err_msg=f"shards={n_shards} k={k}")


@pytest.mark.parametrize("mesh_shape,nz,ny,k", [
    ((2, 4), 16, 32, 2),   # even both axes, full 8-device mesh
    ((2, 3), 22, 40, 2),   # uneven BOTH axes: z pads 2 planes, y pads 8 rows
    pytest.param((2, 2), 16, 32, 3, marks=pytest.mark.slow),  # K=3 +
    # ghost-alignment z-padding (hz=9 on 16 planes)
])
def test_zy_mesh_pallas_sharded_matches_jax(mesh_shape, nz, ny, k):
    """The (z, y) 2-AXIS mesh decomposition (2-wave ghost exchange +
    local K-step Pallas kernel, pad-and-mask on both axes) reproduces the
    single-device run: STATE bit-identical, Sum|u| within f32
    reduction-order noise of the per-shard psum partials."""
    import jax

    if len(jax.devices()) < mesh_shape[0] * mesh_shape[1]:
        pytest.skip("needs 8 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    nx = 128
    steps = 2 * k
    f_ref, av_ref = d3q19.simulate(nz, ny, nx, num_steps=steps)
    mesh = pallas_sharded_3d.make_zy_mesh(*mesh_shape)
    f_sh, av_sh = pallas_sharded_3d.simulate_zy(
        nz, ny, nx, num_steps=steps, mesh=mesh, k_steps=k)
    np.testing.assert_array_equal(
        np.asarray(f_sh), np.asarray(f_ref),
        err_msg=f"mesh={mesh_shape} k={k}")
    np.testing.assert_allclose(
        np.asarray(av_sh), np.asarray(av_ref), rtol=5e-5,
        err_msg=f"mesh={mesh_shape} k={k}")


def test_zy_engine_dispatch_and_rejections():
    """simulate(engine='sharded-pallas-zy') routes to the 2-axis path;
    too-thin y-shards raise the pad-and-mask feasibility error."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    f_ref, av_ref = d3q19.simulate(16, 32, 128, num_steps=4)
    f_sh, av_sh = d3q19.simulate(16, 32, 128, num_steps=4,
                                 engine="sharded-pallas-zy",
                                 mesh_shape=(2, 2))
    np.testing.assert_array_equal(np.asarray(f_sh), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av_sh), np.asarray(av_ref),
                               rtol=5e-5)
    # 12 rows over 4 y-shards: last shard would hold < 8 valid rows
    with pytest.raises(ValueError, match="y-shards"):
        pallas_sharded_3d.simulate_zy(
            16, 12, 128, num_steps=4,
            mesh=pallas_sharded_3d.make_zy_mesh(1, 4), k_steps=2)
    # K deeper than the 8-row y ghost band
    with pytest.raises(ValueError, match="y ghost band"):
        pallas_sharded_3d.make_zy_chunk_fn(
            pallas_sharded_3d.make_zy_mesh(1, 2), k_steps=9, omega=1.85,
            density=0.1, accel=0.005, accel_plane=14, nz=16, ny=32)


def test_overlap_chunk_matches_fused_and_global():
    """The communication/compute-overlapped chunk (interior kernel issued
    before the ghosts land + two 3K-plane boundary kernels) computes the
    same physics as the fused ghost-extended path and the single-device
    run."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    nz, ny, nx = 24, 16, 128
    f_ref, av_ref = d3q19.simulate(nz, ny, nx, num_steps=8)
    for n_shards, k in ((4, 2),):
        mesh = pallas_sharded_3d.make_z_mesh(n_shards)
        f_ov, av_ov = pallas_sharded_3d.simulate(
            nz, ny, nx, num_steps=8, mesh=mesh, k_steps=k, overlap=True)
        f_fu, av_fu = pallas_sharded_3d.simulate(
            nz, ny, nx, num_steps=8, mesh=mesh, k_steps=k)
        np.testing.assert_allclose(np.asarray(av_ov), np.asarray(av_fu),
                                   rtol=1e-6,
                                   err_msg=f"shards={n_shards} k={k}")
        np.testing.assert_allclose(np.asarray(f_ov), np.asarray(f_fu),
                                   rtol=1e-6, atol=1e-8,
                                   err_msg=f"shards={n_shards} k={k}")
        np.testing.assert_allclose(np.asarray(av_ov), np.asarray(av_ref),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(f_ov), np.asarray(f_ref),
                                   rtol=2e-5, atol=1e-7)


def test_overlap_rejects_thin_or_padded_shards():
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    mesh = pallas_sharded_3d.make_z_mesh(4)
    # uneven nz pads the last shard -> overlap unsupported
    with pytest.raises(ValueError, match="pad"):
        pallas_sharded_3d.simulate(22, 16, 128, num_steps=4, mesh=mesh,
                                   k_steps=2, overlap=True)
    # h = 4 < 3K = 6: no ghost-independent interior
    with pytest.raises(ValueError, match="interior"):
        pallas_sharded_3d.simulate(16, 16, 128, num_steps=4, mesh=mesh,
                                   k_steps=2, overlap=True)


def test_simulate_rejects_overlap_on_other_engines():
    import pytest

    # overlap is a sharded-pallas-only feature; other engines must raise
    # rather than silently run without it (so a benchmark can't
    # mis-attribute a fused-path timing to the overlap)
    for engine in ("jax", "pallas", "sharded", "native"):
        with pytest.raises(ValueError, match="overlap"):
            d3q19.simulate(8, 8, 16, num_steps=2, engine=engine,
                           overlap=True)


class TestGolden3D:
    """Regression anchor for the 3-D engines: a committed f64 CPU trace
    (tests/data/d3q19_16x16x32_200.av_vels.dat) plays the role check/ plays
    for 2-D — the reference has no 3-D goldens, so this framework ships its
    own."""

    GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                          "d3q19_16x16x32_200.av_vels.dat")

    def _golden(self):
        return np.loadtxt(self.GOLDEN, usecols=1, delimiter="\t")

    def test_f64_matches_exactly(self):
        import jax

        with jax.enable_x64(True):
            _, av = d3q19.simulate(16, 16, 32, num_steps=200,
                                   dtype=np.float64)
            av = np.asarray(av, np.float64)
        g = self._golden()
        np.testing.assert_allclose(av[1:], g[1:], rtol=1e-12)

    @pytest.mark.parametrize("engine,k", [("jax", None), ("pallas", 2)])
    def test_f32_engines_within_floor(self, engine, k):
        kw = {"k_steps": k} if k else {}
        _, av = d3q19.simulate(16, 16, 32, num_steps=200, engine=engine, **kw)
        av = np.asarray(av, np.float64)
        g = self._golden()
        rel = np.abs(av[1:] - g[1:]) / np.abs(g[1:])
        assert rel.max() < 1e-4, f"{engine}: {rel.max():.3e}"


@pytest.mark.parametrize("cases", [
    ((22, 4, 2), (14, 2, 4)),
    pytest.param(((10, 4, 1), (30, 4, 2)), marks=pytest.mark.slow),
])
def test_ghost_plane_pallas_sharded_uneven_nz(cases):
    """Uneven nz runs via pad-and-mask on the z-shards (the 3-D analogue of
    the 2-D remainder strategy): av_vels and the valid planes match the
    single-device run."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    ny, nx = 16, 128
    for nz, n_shards, k in cases:
        f_ref, av_ref = d3q19.simulate(nz, ny, nx, num_steps=4 * k)
        mesh = pallas_sharded_3d.make_z_mesh(n_shards)
        f_sh, av_sh = pallas_sharded_3d.simulate(
            nz, ny, nx, num_steps=4 * k, mesh=mesh, k_steps=k)
        assert f_sh.shape == (19, nz, ny, nx)
        np.testing.assert_allclose(np.asarray(av_sh), np.asarray(av_ref),
                                   rtol=2e-5, atol=2e-8,
                                   err_msg=f"nz={nz} shards={n_shards} k={k}")
        np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                                   rtol=2e-5, atol=1e-7,
                                   err_msg=f"nz={nz} shards={n_shards} k={k}")


def test_local_engine_inplace_matches_two_stream():
    """The in-place aliased local kernel family (the sharded default) is
    bit-identical to the two-stream kernel on every shard — the multi-chip
    path inherits the single-chip parity guarantee (interpret mode
    executes DMAs in program order, so this exercises the in-place
    write-back ordering under shard_map)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    nz, ny, nx = 16, 16, 128
    mesh = pallas_sharded_3d.make_z_mesh(4)
    f_ip, av_ip = pallas_sharded_3d.simulate(
        nz, ny, nx, num_steps=4, mesh=mesh, k_steps=2,
        local_engine="inplace")
    f_ts, av_ts = pallas_sharded_3d.simulate(
        nz, ny, nx, num_steps=4, mesh=mesh, k_steps=2,
        local_engine="two-stream")
    np.testing.assert_array_equal(np.asarray(f_ip), np.asarray(f_ts))
    np.testing.assert_array_equal(np.asarray(av_ip), np.asarray(av_ts))


def test_ghost_plane_sharded_k3():
    """K=3 ghost depth (only the in-place family supports K=3 locally —
    the two-stream kernel needs K | bz): matches the single-device run."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from lbm_tpu.parallel import pallas_sharded_3d

    nz, ny, nx = 18, 16, 128
    f_ref, av_ref = d3q19.simulate(nz, ny, nx, num_steps=6)
    mesh = pallas_sharded_3d.make_z_mesh(2)
    f_sh, av_sh = pallas_sharded_3d.simulate(
        nz, ny, nx, num_steps=6, mesh=mesh, k_steps=3)
    np.testing.assert_allclose(np.asarray(av_sh), np.asarray(av_ref),
                               rtol=2e-5, atol=2e-8)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               rtol=2e-5, atol=1e-7)


def test_plan_planes_rejects_too_many_shards():
    import pytest

    from lbm_tpu.parallel import pallas_sharded_3d

    with pytest.raises(ValueError, match="valid planes"):
        pallas_sharded_3d.plan_planes(9, 8, 2)


def test_final_state_slice_writer(tmp_path):
    """The z-slice writer emits the exact 2-D final_state format with
    correct 3-D macroscopics (u = full 3-D speed, in-plane u_x/u_y)."""
    from lbm_tpu.core import io as io_lib
    from lbm_tpu.models import lbm3d as lbm3d_model

    nz, ny, nx = 8, 8, 16
    f, _ = d3q19.simulate(nz, ny, nx, num_steps=10)
    f = np.asarray(f)
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = mask[-1] = True
    z = nz - 2
    path = tmp_path / "fs.dat"
    lbm3d_model.write_final_state_slice(path, f, mask, z, 0.1)
    rows = io_lib.read_final_state(path)
    assert rows.shape == (ny * nx, 7)
    # independent macroscopics at one cell
    jj, ii = 3, 5
    fz = f[:, z, jj, ii].astype(np.float64)
    rho = fz.sum()
    u_vec = (d3q19.E.astype(np.float64).T @ fz) / rho  # (dz, dy, dx)
    row = rows[jj * nx + ii]
    assert row[0] == ii and row[1] == jj
    np.testing.assert_allclose(row[2], u_vec[2], rtol=1e-5)  # u_x
    np.testing.assert_allclose(row[3], u_vec[1], rtol=1e-5)  # u_y
    np.testing.assert_allclose(row[4], np.linalg.norm(u_vec), rtol=1e-5)
    # obstacle plane: zero velocity, obstacle flag set
    lbm3d_model.write_final_state_slice(path, f, mask, 0, 0.1)
    wall = io_lib.read_final_state(path)
    assert (wall[:, 2:5] == 0).all() and (wall[:, 6] == 1).all()


def test_grouping_variants_agree():
    """Round-4 VERDICT #7: the 'paired' (default) and 'reference' BGK
    expression groupings are algebraically identical — a full step under
    each must agree to f32 ulp-scale tolerance (the measured A/B is
    experiments/lbm3d-perf/regroup.csv; both are flat in speed, paired
    stays default for oracle rounding-class alignment)."""
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = (
        "import numpy as np, jax; jax.config.update('jax_platforms','cpu')\n"
        "import jax.numpy as jnp\n"
        "from lbm_tpu.ops import d3q19\n"
        "f = jnp.asarray(d3q19.initial_distributions(4, 8, 16, 0.1, np.float32))\n"
        "f = f * (1 + 0.01*jnp.sin(jnp.arange(f.size).reshape(f.shape)*0.7))\n"
        "mask = np.zeros((4, 8, 16), bool); mask[0] = True; mask[-1] = True\n"
        "am = d3q19.accel_plane_mask(4, 8, 16, 2)\n"
        "fn, tots = d3q19.run(f, jnp.asarray(mask), am, num_steps=20,\n"
        "                     omega=1.85, density=0.1, accel=0.005)\n"
        "np.save('OUT', np.asarray(fn, np.float64))\n"
    )
    outs = {}
    for grouping in ("reference", "paired"):
        env = dict(os.environ, LBM_D3Q19_GROUPING=grouping)
        p = subprocess.run(
            [sys.executable, "-c", prog.replace("'OUT'",
                                                f"'/tmp/group_{grouping}'")],
            env=env, capture_output=True, text=True, cwd=REPO)
        assert p.returncode == 0, p.stderr
        outs[grouping] = np.load(f"/tmp/group_{grouping}.npy")
    a, b = outs["reference"], outs["paired"]
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-9)
    assert not np.array_equal(a, b)  # genuinely different rounding class
