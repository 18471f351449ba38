"""L0 tests: params/obstacles loaders and exact-format .dat writers."""

import numpy as np
import pytest

from lbm_tpu.core import io, state
from lbm_tpu.core.params import Obstacles, Params, reynolds_number


def test_params_from_reference_file(reference_dir):
    p = Params.from_file(f"{reference_dir}/params/input_128x128.params")
    assert (p.nx, p.ny, p.max_iters, p.reynolds_dim) == (128, 128, 40000, 10)
    assert (p.density, p.accel, p.omega) == (0.1, 0.005, 1.85)


def test_params_roundtrip(tmp_path):
    p = Params(64, 32, 100, 10, 0.1, 0.005, 1.85)
    p.to_file(tmp_path / "x.params")
    assert Params.from_file(tmp_path / "x.params") == p


def test_obstacles_from_reference_file(reference_dir):
    p = Params.from_file(f"{reference_dir}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{reference_dir}/params/obstacles_128x128.dat", p)
    # 512 lines in the file, but the 4 corners appear twice -> 508 unique
    assert obs.num_blocked == 508
    assert obs.num_free == 128 * 128 - 508
    # boundary walls: whole top and bottom rows blocked in this mask? inspect
    # known property: file contains `x 0 1` entries for the bottom row.
    assert obs.at(0, 0)


def test_obstacles_roundtrip(tmp_path):
    p = Params(8, 4, 1, 10, 0.1, 0.005, 1.85)
    mask = np.zeros((4, 8), dtype=bool)
    mask[1, 3] = True
    mask[2, 7] = True
    obs = Obstacles(mask)
    obs.to_file(tmp_path / "obs.dat")
    obs2 = Obstacles.from_file(tmp_path / "obs.dat", p)
    np.testing.assert_array_equal(obs.mask, obs2.mask)


def test_obstacles_validation(tmp_path):
    p = Params(4, 4, 1, 10, 0.1, 0.005, 1.85)
    (tmp_path / "bad.dat").write_text("9 0 1\n")
    with pytest.raises(ValueError, match="x-coord"):
        Obstacles.from_file(tmp_path / "bad.dat", p)
    (tmp_path / "bad2.dat").write_text("0 0 2\n")
    with pytest.raises(ValueError, match="blocked"):
        Obstacles.from_file(tmp_path / "bad2.dat", p)


def test_initial_distributions_weights():
    p = Params(4, 4, 1, 10, 0.1, 0.005, 1.85)
    f = state.initial_distributions(p, np.float64)
    assert f.shape == (9, 4, 4)
    np.testing.assert_allclose(f[0], 0.1 * 4 / 9)
    np.testing.assert_allclose(f[1:5], 0.1 / 9)
    np.testing.assert_allclose(f[5:9], 0.1 / 36)
    # total density = nx*ny*rho
    np.testing.assert_allclose(state.total_density(f), 16 * 0.1, rtol=1e-12)


def test_av_vels_write_read_roundtrip(tmp_path):
    av = np.array([1.094269153342e-05, 2.5e-4, 3.25e-3])
    io.write_av_vels(tmp_path / "av.dat", av)
    text = (tmp_path / "av.dat").read_text()
    assert text.splitlines()[0] == "0:\t1.094269153342E-05"
    np.testing.assert_allclose(io.read_av_vels(tmp_path / "av.dat"), av, rtol=1e-12)


def test_final_state_format_matches_reference(tmp_path, reference_dir):
    """Obstacle-cell lines must match the golden file byte-for-byte (f64)."""
    p = Params.from_file(f"{reference_dir}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{reference_dir}/params/obstacles_128x128.dat", p)
    f = state.initial_distributions(p, np.float64)
    io.write_final_state(tmp_path / "fs.dat", p, obs.mask, f)
    ours = (tmp_path / "fs.dat").read_text().splitlines()
    golden = open(f"{reference_dir}/check/128x128.final_state.dat").read().splitlines()
    assert len(ours) == len(golden) == 128 * 128
    # line 0 is an obstacle cell: identical including pressure rho/3
    assert ours[0] == golden[0]


def test_reynolds_number():
    p = Params(128, 128, 1, 10, 0.1, 0.005, 1.85)
    # nu = (2/1.85 - 1)/6
    nu = (2 / 1.85 - 1) / 6
    assert reynolds_number(p, 0.01) == pytest.approx(0.01 * 10 / nu, rel=1e-12)
