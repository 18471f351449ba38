"""Multi-chip domain decomposition tests on an 8-virtual-device CPU mesh.

Validates that the explicit ppermute 2-wave halo exchange and the
XLA-implicit strategy both reproduce the single-device global step exactly —
including periodic wraparound and corner speeds across shard boundaries
(the flipped-corner-speed concern from the reference, main/LbmPoplibs.cpp:161-168).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lbm_tpu.core import state
from lbm_tpu.core.params import Params
from lbm_tpu.ops import d2q9
from lbm_tpu.parallel import halo, mesh as mesh_lib, partition

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_case(ny, nx):
    rng = np.random.default_rng(11)
    f = rng.uniform(0.01, 1.0, size=(9, ny, nx)).astype(np.float32)
    mask = np.zeros((ny, nx), bool)
    mask[ny // 3 : ny // 2, nx // 3 : nx // 2] = True
    # obstacles touching shard boundaries and the wraparound edge
    mask[0, :] = True
    mask[:, 0] = True
    return f, mask


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_ppermute_step_matches_global(shape):
    r, c = shape
    n = r * c
    ny, nx = 16 * r, 16 * c
    f, mask = make_case(ny, nx)
    amask = d2q9.accel_row_mask(ny, nx, ny - 2)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36

    f_ref, tot_ref = d2q9.step(
        jnp.asarray(f), jnp.asarray(mask), amask, omega=1.85, accel_w1=w1, accel_w2=w2
    )

    dev_grid = np.array(jax.devices()[:n]).reshape(r, c)
    mesh = jax.sharding.Mesh(dev_grid, (mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS))
    step_fn = halo.make_sharded_step(mesh, omega=1.85, accel_w1=w1, accel_w2=w2)
    fs = mesh_lib.grid_sharding(mesh)
    ms = mesh_lib.mask_sharding(mesh)
    f_sh = jax.device_put(jnp.asarray(f), fs)
    mask_sh = jax.device_put(jnp.asarray(mask), ms)
    amask_sh = jax.device_put(amask, jax.sharding.NamedSharding(mesh, P(mesh_lib.ROW_AXIS, None)))

    f_dist, tot_dist = jax.jit(step_fn)(f_sh, mask_sh, amask_sh)
    np.testing.assert_allclose(np.asarray(f_dist), np.asarray(f_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(tot_dist), float(tot_ref), rtol=1e-4)


def test_implicit_strategy_matches_ppermute_over_steps(reference_dir):
    """Both strategies run the 128x128 reference case for 20 steps and agree
    with each other and with the single-device scan."""
    import dataclasses

    from lbm_tpu.core.params import Obstacles

    p = Params.from_file(f"{reference_dir}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{reference_dir}/params/obstacles_128x128.dat", p)
    p20 = dataclasses.replace(p, max_iters=20)
    f0 = state.initial_distributions(p20, np.float32)

    _, av_single = d2q9.simulate(p20, jnp.asarray(f0), jnp.asarray(obs.mask))

    mesh = mesh_lib.make_mesh(8, p.ny, p.nx)
    _, av_pp = halo.simulate_sharded(p20, f0, obs.mask, mesh, strategy="ppermute")
    _, av_imp = halo.simulate_sharded(p20, f0, obs.mask, mesh, strategy="implicit")

    np.testing.assert_allclose(np.asarray(av_pp), np.asarray(av_single), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(av_imp), np.asarray(av_single), rtol=1e-5)


@pytest.mark.parametrize("shape,exchange", [
    ((2, 4), "naive"), ((8, 1), "naive"),
    ((2, 4), "manytensors"), ((8, 1), "manytensors"),
])
def test_explicit_strategy_matches_global(shape, exchange):
    """The per-direction explicit exchanges — 'naive' (serialised, the
    reference's explicitOneTensor analogue) and 'manytensors' (persistent
    ghost buffer, the explicitManyTensors analogue) — must be physically
    correct."""
    r, c = shape
    ny, nx = 16 * r, 16 * c
    f, mask = make_case(ny, nx)
    amask = d2q9.accel_row_mask(ny, nx, ny - 2)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36

    f_ref, tot_ref = d2q9.step(
        jnp.asarray(f), jnp.asarray(mask), amask, omega=1.85, accel_w1=w1, accel_w2=w2
    )
    dev_grid = np.array(jax.devices()[: r * c]).reshape(r, c)
    mesh = jax.sharding.Mesh(dev_grid, (mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS))
    step_fn = halo.make_sharded_step(mesh, omega=1.85, accel_w1=w1,
                                     accel_w2=w2, exchange=exchange)
    f_sh = jax.device_put(jnp.asarray(f), mesh_lib.grid_sharding(mesh))
    mask_sh = jax.device_put(jnp.asarray(mask), mesh_lib.mask_sharding(mesh))
    amask_sh = jax.device_put(
        amask, jax.sharding.NamedSharding(mesh, P(mesh_lib.ROW_AXIS, None)))
    f_dist, tot_dist = jax.jit(step_fn)(f_sh, mask_sh, amask_sh)
    np.testing.assert_allclose(np.asarray(f_dist), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(tot_dist), float(tot_ref), rtol=1e-4)


def test_corner_speed_crosses_shard_boundary_diagonally():
    """A NE-moving particle at a 2x2 shard corner must arrive at the
    diagonally-adjacent shard after one step (two-hop corner exchange)."""
    ny = nx = 32
    f = np.zeros((9, ny, nx), np.float32)
    f[:] = 0.1  # background so densities stay positive
    f[5, 15, 15] = 3.0  # NE speed at the corner of shard (0,0)

    mask = np.zeros((ny, nx), bool)
    amask = jnp.zeros((ny, 1), jnp.float32)

    f_ref, _ = d2q9.step(jnp.asarray(f), jnp.asarray(mask), amask,
                         omega=1.0, accel_w1=0.0, accel_w2=0.0)

    dev_grid = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = jax.sharding.Mesh(dev_grid, (mesh_lib.ROW_AXIS, mesh_lib.COL_AXIS))
    step_fn = halo.make_sharded_step(mesh, omega=1.0, accel_w1=0.0, accel_w2=0.0)
    f_sh = jax.device_put(jnp.asarray(f), mesh_lib.grid_sharding(mesh))
    mask_sh = jax.device_put(jnp.asarray(mask), mesh_lib.mask_sharding(mesh))
    amask_sh = jax.device_put(amask, jax.sharding.NamedSharding(mesh, P(mesh_lib.ROW_AXIS, None)))
    f_dist, _ = jax.jit(step_fn)(f_sh, mask_sh, amask_sh)

    np.testing.assert_allclose(np.asarray(f_dist), np.asarray(f_ref), rtol=1e-4, atol=1e-6)
    # the streamed mass really did land at (16,16), i.e. on shard (1,1)
    assert np.asarray(f_dist)[5, 16, 16] > np.asarray(f_dist)[5, 16, 17]


class TestPartitionPlanner:
    def test_even_split_and_stats(self):
        part = partition.partition_for_devices(1024, 1024, 8)
        st = partition.stats(part)
        assert st.num_targets == 8
        assert st.total_cells == 1024 * 1024
        assert st.load_balance == 1.0
        assert st.max_speedup == 8.0

    def test_band_subdivision(self):
        part = partition.partition_for_devices(1024, 1024, 4)
        bands = partition.to_band_partitions(part, band=64)
        st = partition.stats(bands)
        assert st.total_cells == 1024 * 1024
        heights = {s.height for s in bands.values()}
        assert heights == {64}

    def test_json_roundtrip(self, tmp_path):
        part = partition.partition_for_devices(128, 128, 4)
        text = partition.serialize_to_json(part, tmp_path / "p.json")
        import json

        doc = json.loads(text)
        assert len(doc) == 4
        first = doc[sorted(doc)[0]]
        assert set(first) == {"rows", "cols"}

    def test_best_factorisation_prefers_square(self):
        assert mesh_lib.best_factorisation(4, 1024, 1024) == (2, 2)
        assert mesh_lib.best_factorisation(8, 1024, 1024) in ((2, 4), (4, 2))
        with pytest.raises(ValueError):
            mesh_lib.best_factorisation(7, 10, 10)


def test_viz_render_properties():
    """viz_partition.render: every cell painted, borders white, RGBA shape."""
    from lbm_tpu.cli.viz_partition import render

    part = partition.partition_for_devices(32, 48, 4)
    img = render(part, 32, 48)
    assert img.shape == (32, 48, 4)
    assert img[..., 3].min() == 255
    assert img[..., :3].max() > 0
    # border pixels of the first slice are white
    sl = next(iter(part.values()))
    assert (img[sl.row_start, sl.col_start:sl.col_end, :3] == 255).all()


def test_planner_handles_grids_the_padded_runtime_cannot():
    """Round-2 review regression: the pad-and-mask spill constraint must not
    leak into the planner, whose round-robin remainder splits handle any
    grid (reference: StructuredGridUtils.hpp remainder strategies)."""
    part = partition.partition_for_devices(9, 9, 8)
    st = partition.stats(part)
    assert st.num_targets == 8
    assert st.total_cells == 81


def _covers_exactly(parent: dict, child: dict) -> bool:
    """Child slices form a disjoint exact cover of the parent slices."""
    import numpy as np

    ny = max(s.row_end for s in parent.values())
    nx = max(s.col_end for s in parent.values())
    cnt = np.zeros((ny, nx), int)
    for s in child.values():
        cnt[s.row_start:s.row_end, s.col_start:s.col_end] += 1
    want = np.zeros((ny, nx), int)
    for s in parent.values():
        want[s.row_start:s.row_end, s.col_start:s.col_end] += 1
    return bool((cnt == want).all())


class TestBlockStrategies:
    """The reference's four-strategy tile family (singleTile /
    longAndNarrow / shortAndWide / generalTileGrid dispatched by slice
    shape, StructuredGridUtils.hpp:568-587) recast in VPU-tile units."""

    def test_dispatch_by_shape(self):
        S = partition.Slice2D
        assert partition.dispatch_strategy(S(0, 8, 0, 128), 6) == "single"
        assert partition.dispatch_strategy(S(0, 512, 0, 128), 6) == "rows"
        assert partition.dispatch_strategy(S(0, 8, 0, 1024), 6) == "cols"
        assert partition.dispatch_strategy(S(0, 256, 0, 512), 6) == "grid"

    @pytest.mark.parametrize("ny,nx,blocks", [(512, 512, 6), (64, 1024, 4),
                                              (1024, 128, 6), (16, 128, 6)])
    def test_auto_blocks_cover_exactly(self, ny, nx, blocks):
        part = partition.partition_for_devices(ny, nx, 4)
        blk = partition.to_block_partitions(part, blocks)
        assert _covers_exactly(part, blk)
        assert partition.stats(blk).total_cells == ny * nx

    def test_forced_grid_strategy_covers(self):
        part = partition.partition_for_devices(256, 512, 2)
        blk = partition.to_block_partitions(part, 6, strategy="grid")
        assert _covers_exactly(part, blk)
        # more than one block per device along both axes
        rows = {s.row_start for s in blk.values()}
        cols = {s.col_start for s in blk.values()}
        assert len(rows) > 2 and len(cols) > 1

    def test_fixed_overlay_matches_reference_shape(self):
        """newTilePartitions analogue: a fixed R x C overlay per device
        slice with round-robin remainders."""
        part = partition.partition_for_devices(1024, 1024, 1)
        blk = partition.fixed_overlay_partitions(part, 38, 32)
        assert len(blk) == 38 * 32
        assert _covers_exactly(part, blk)
        heights = {s.height for s in blk.values()}
        assert heights == {26, 27}  # 1024 = 38*27 - 2, reference's 27/26 rows
