"""Communication-avoiding distributed Pallas path vs the global engine.

Exactness claim under test: with 8-row ghost bands exchanged once per K
steps, every shard's own rows match the global single-device evolution
bit-for-bit-ish (f32 fusion noise) for K <= 8.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.core import io, state
from lbm_tpu.core.params import Obstacles, Params
from lbm_tpu.ops import d2q9
from lbm_tpu.parallel import pallas_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_case(ny, nx):
    """A physically-stable state: equilibrium + 1% perturbation. Random
    per-speed states have |u| ~ 0.8 (far beyond LBM stability) and chaotically
    amplify engine-level f32 epsilon differences, making bit-comparisons
    meaningless."""
    rng = np.random.default_rng(23)
    p = Params(nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    f = state.initial_distributions(p, np.float32)
    f *= (1.0 + 0.01 * rng.uniform(-1, 1, size=f.shape)).astype(np.float32)
    mask = np.zeros((ny, nx), bool)
    mask[0, :] = True
    mask[ny // 3 : ny // 3 + 3, nx // 4 : nx // 2] = True
    return f, mask


@pytest.mark.parametrize("n_shards,k_steps", [
    # (8,4) exercises deep-K on the full mesh, (4,2) the production default
    # on a smaller mesh; the K=1 / K=8 duplicates cover no extra code path
    (8, 4), (4, 2),
    pytest.param(8, 1, marks=pytest.mark.slow),
    pytest.param(8, 8, marks=pytest.mark.slow),
])
def test_matches_global_engine(n_shards, k_steps):
    ny, nx = 128, 128
    f, mask = make_case(ny, nx)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    accel_row = ny - 2
    num_steps = 8

    # global reference evolution
    amask = d2q9.accel_row_mask(ny, nx, accel_row)
    f_ref, tots_ref = d2q9.run(
        jnp.asarray(f), jnp.asarray(mask), amask,
        num_steps=num_steps, omega=1.85, accel_w1=w1, accel_w2=w2,
    )

    mesh = pallas_sharded.make_row_mesh(n_shards)
    mask_ext = jnp.asarray(pallas_sharded.extended_mask(mask, n_shards),
                           jnp.float32)
    f_dist, tots = pallas_sharded.run(
        jnp.asarray(f), mask_ext, mesh=mesh, num_steps=num_steps,
        k_steps=k_steps, omega=1.85, accel_w1=w1, accel_w2=w2,
        accel_row=accel_row, ny=ny, band=8,
    )
    np.testing.assert_allclose(np.asarray(f_dist), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tots), np.asarray(tots_ref),
                               rtol=1e-4)


def test_local_engine_inplace_matches_two_stream():
    """The in-place aliased local kernel (the sharded default since round
    3) is bit-identical to the two-stream kernel on every shard — the
    multi-chip path inherits the single-chip parity guarantee (interpret
    mode executes DMAs in program order, exercising the in-place
    write-back ordering under shard_map)."""
    ny, nx = 64, 128
    f, mask = make_case(ny, nx)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    mesh = pallas_sharded.make_row_mesh(4)
    mask_ext = jnp.asarray(pallas_sharded.extended_mask(mask, 4),
                           jnp.float32)
    kw = dict(mesh=mesh, num_steps=4, k_steps=2, omega=1.85, accel_w1=w1,
              accel_w2=w2, accel_row=ny - 2, ny=ny, band=8)
    f_ip, t_ip = pallas_sharded.run(jnp.asarray(f), mask_ext,
                                    local_engine="inplace", **kw)
    f_ts, t_ts = pallas_sharded.run(jnp.asarray(f), mask_ext,
                                    local_engine="two-stream", **kw)
    np.testing.assert_array_equal(np.asarray(f_ip), np.asarray(f_ts))
    np.testing.assert_array_equal(np.asarray(t_ip), np.asarray(t_ts))


def test_simulate_golden_prefix(reference_dir):
    """Distributed Pallas run reproduces the golden av_vels prefix in f32."""
    p = Params.from_file(f"{reference_dir}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{reference_dir}/params/obstacles_128x128.dat", p)
    golden = io.read_av_vels(f"{reference_dir}/check/128x128.av_vels.dat")
    n = 16
    p_n = dataclasses.replace(p, max_iters=n)
    f0 = state.initial_distributions(p_n, np.float32)
    mesh = pallas_sharded.make_row_mesh(8)
    _, av = pallas_sharded.simulate(p_n, f0, obs.mask, mesh, k_steps=4, band=8)
    rel = np.abs(np.asarray(av, np.float64) - golden[:n]) / golden[:n]
    assert rel.max() < 1e-4


def test_extended_mask_wraps():
    mask = np.zeros((32, 16), bool)
    mask[0, :] = True   # global bottom row blocked
    mask[31, 5] = True
    ext = pallas_sharded.extended_mask(mask, 4)
    assert ext.shape == (4 * 24, 16)
    shard0 = ext[:24]
    # shard 0's south ghost rows are global rows 24..31 (wraparound)
    assert shard0[7, 5]  # global row 31
    assert shard0[8, 0]  # own row 0 (blocked)


def test_2d_mesh_matches_global_engine():
    """2-D ('ry','rx') mesh with 128-column ghost bands: own cells match the
    global evolution for K <= 8."""
    ny, nx = 32, 512  # 2x4 mesh -> shards of 16 x 128
    f, mask = make_case(ny, nx)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    accel_row = ny - 2
    num_steps = 8

    amask = d2q9.accel_row_mask(ny, nx, accel_row)
    f_ref, tots_ref = d2q9.run(
        jnp.asarray(f), jnp.asarray(mask), amask,
        num_steps=num_steps, omega=1.85, accel_w1=w1, accel_w2=w2,
    )

    mesh = pallas_sharded.make_mesh2d(2, 4)
    mask_ext = jnp.asarray(pallas_sharded.extended_mask(mask, 2, 4), jnp.float32)
    f_dist, tots = pallas_sharded.run(
        jnp.asarray(f), mask_ext, mesh=mesh, num_steps=num_steps,
        k_steps=4, omega=1.85, accel_w1=w1, accel_w2=w2,
        accel_row=accel_row, ny=ny, band=8,
    )
    np.testing.assert_allclose(np.asarray(f_dist), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tots), np.asarray(tots_ref), rtol=1e-4)


def test_rejects_too_deep_k():
    mesh = pallas_sharded.make_row_mesh(2)
    with pytest.raises(ValueError, match="k_steps"):
        pallas_sharded.make_chunk_fn(
            mesh, k_steps=9, omega=1.85, accel_w1=0.0, accel_w2=0.0,
            accel_row=1, ny=64,
        )


def test_local_stepk_falls_back_to_two_stream():
    """Round-4 advisor fix: when pick_engine finds no feasible in-place
    config for a ghost-extended shard shape (nz=4 at K=4: single slab,
    no blocked bz), _local_stepk must fall back to the two-stream kernel
    (bit-identical arithmetic) instead of raising."""
    import jax.numpy as jnp

    from lbm_tpu.ops import d3q19_pallas
    from lbm_tpu.parallel import pallas_sharded_3d

    rng = np.random.default_rng(5)
    f = jnp.asarray(
        (0.1 / 19 + 0.001 * rng.random((19, 4, 8, 128))).astype(np.float32))
    mask_f = jnp.zeros((4, 8, 128), jnp.float32)
    kw = dict(omega=1.85, density=0.1, accel=0.005, accel_plane=2)
    stepk = pallas_sharded_3d._local_stepk("inplace", 4, None)
    fi, ti = stepk(f, mask_f, k_steps=4, **kw)
    fa, ta = d3q19_pallas.stepk(f, mask_f, k_steps=4, **kw)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(fa))
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ta))


@pytest.mark.parametrize("mesh_shape,ny,nx,scheme", [
    ((8, 1), 192, 128, "auto"),   # row mesh, h = 24 = 3*GHOST (minimum)
    ((2, 4), 64, 512, "auto"),    # 2-D mesh: row scheme (column wave
                                  # exposed, row wave overlapped)
    ((2, 4), 48, 1536, "full2d"), # 2-D mesh, 384-col shards: opt-in
                                  # FULL2D (both waves overlapped, 5
                                  # kernels, corner second hops)
])
def test_overlap_bit_parity_with_fused(mesh_shape, ny, nx, scheme):
    """Round-4 VERDICT #5 + round-5 #9: the exchange/compute-overlapped
    chunk's STATE must be BIT-identical to the fused path — same per-cell
    arithmetic, the kernels' valid windows partition the owned cells
    exactly. The Sum|u| diagnostic is reduction-order-equal only (3 or 5
    partial sums instead of one -> f32 ulp differences)."""
    f, mask = make_case(ny, nx)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    kw = dict(num_steps=8, k_steps=4, omega=1.85, accel_w1=w1, accel_w2=w2,
              accel_row=ny - 2, ny=ny)
    r, c = mesh_shape
    mesh = pallas_sharded.make_mesh2d(r, c)
    mask_ext = jnp.asarray(pallas_sharded.extended_mask(mask, r, c),
                           jnp.float32)
    f_fused, t_fused = pallas_sharded.run(
        jnp.asarray(f), mask_ext, mesh=mesh, **kw)
    f_over, t_over = pallas_sharded.run(
        jnp.asarray(f), mask_ext, mesh=mesh, overlap=True, scheme=scheme,
        **kw)
    np.testing.assert_array_equal(np.asarray(f_over), np.asarray(f_fused))
    np.testing.assert_allclose(np.asarray(t_over), np.asarray(t_fused),
                               rtol=1e-6)


def test_overlap_scheme_routing():
    """'auto' resolves to 'row' (the exchange model prices full2d's W/E
    strip recompute above the column wave it hides); 'full2d' is opt-in
    and needs BOTH column shards and a column interior (>= 3*GHOST_COLS
    wide) to hide the column wave under."""
    gc = pallas_sharded.GHOST_COLS
    assert pallas_sharded.overlap_scheme(1, 4096) == "row"
    assert pallas_sharded.overlap_scheme(4, 1024) == "row"
    assert pallas_sharded.overlap_scheme(4, 1024, "row") == "row"
    assert pallas_sharded.overlap_scheme(2, 3 * gc, "full2d") == "full2d"
    assert pallas_sharded.overlap_scheme(4, 1024, "full2d") == "full2d"
    with pytest.raises(ValueError, match="column-sharded"):
        pallas_sharded.overlap_scheme(1, 4096, "full2d")
    with pytest.raises(ValueError, match="column interior"):
        pallas_sharded.overlap_scheme(4, 3 * gc - gc, "full2d")
    with pytest.raises(ValueError, match="scheme"):
        pallas_sharded.overlap_scheme(4, 1024, "bogus")


def test_overlap_rejects_thin_and_padded_shards():
    mesh = pallas_sharded.make_row_mesh(8)
    kw = dict(k_steps=4, omega=1.85, accel_w1=1e-4, accel_w2=1e-5,
              accel_row=6)
    with pytest.raises(ValueError, match="rows per shard"):
        pallas_sharded.make_overlap_chunk_fn(mesh, ny=128, **kw)  # h=16
    with pytest.raises(ValueError, match="evenly-sharded"):
        # h=32, last shard 8 valid rows -> 24 pad rows
        pallas_sharded.make_overlap_chunk_fn(mesh, ny=232, **kw)
