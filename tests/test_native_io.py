"""Native I/O library: byte-parity with the pure-Python writers."""

import numpy as np
import pytest

from lbm_tpu.core import io, state
from lbm_tpu.core.params import Obstacles, Params
from lbm_tpu.utils import native_io

native = native_io.load()
pytestmark = pytest.mark.skipif(native is None, reason="native toolchain unavailable")

RNG = np.random.default_rng(5)


def test_final_state_byte_parity(tmp_path):
    p = Params(nx=32, ny=16, max_iters=1, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    f = state.initial_distributions(p, np.float64)
    f += RNG.uniform(0, 0.01, f.shape)
    mask = np.zeros((16, 32), bool)
    mask[3:5, 7:9] = True

    # force the python path
    io._NATIVE, io._NATIVE_CHECKED = None, True
    io.write_final_state(tmp_path / "py.dat", p, mask, f)
    # force the native path
    io._NATIVE, io._NATIVE_CHECKED = native, True
    io.write_final_state(tmp_path / "native.dat", p, mask, f)
    io._NATIVE_CHECKED = False  # restore lazy behaviour

    assert (tmp_path / "py.dat").read_bytes() == (tmp_path / "native.dat").read_bytes()


def test_av_vels_byte_parity(tmp_path):
    vals = RNG.uniform(1e-6, 1e-3, 100)
    io.write_av_vels(tmp_path / "py.dat", vals)
    native.write_av_vels(str(tmp_path / "native.dat"), vals)
    assert (tmp_path / "py.dat").read_bytes() == (tmp_path / "native.dat").read_bytes()


def test_read_obstacles_matches_python(reference_dir):
    p = Params.from_file(f"{reference_dir}/params/input_128x128.params")
    py_mask = Obstacles.from_file(f"{reference_dir}/params/obstacles_128x128.dat", p).mask
    native_mask = native.read_obstacles(
        f"{reference_dir}/params/obstacles_128x128.dat", p.ny, p.nx
    )
    np.testing.assert_array_equal(py_mask, native_mask)


def test_read_obstacles_rejects_out_of_range(tmp_path):
    (tmp_path / "bad.dat").write_text("99 0 1\n")
    with pytest.raises(ValueError):
        native.read_obstacles(str(tmp_path / "bad.dat"), 4, 4)


def test_read_obstacles_rejects_extra_tokens(tmp_path):
    """Exactly three fields per line, like the Python loader."""
    (tmp_path / "six.dat").write_text("0 0 1 1 1 1\n")
    with pytest.raises(ValueError):
        native.read_obstacles(str(tmp_path / "six.dat"), 4, 4)


def test_final_state_arrays_native_and_python_paths_byte_identical(tmp_path):
    """write_final_state_arrays (the single home of the row format after the
    round-2 refactor) must emit identical bytes through the native C++ fast
    path and the pure-Python fallback."""
    from unittest import mock

    import numpy as np

    from lbm_tpu.core import io

    rng = np.random.default_rng(3)
    ny, nx = 5, 7
    fields = [rng.standard_normal((ny, nx)) for _ in range(4)]
    obs = rng.random((ny, nx)) < 0.3
    p_native, p_python = tmp_path / "n.dat", tmp_path / "p.dat"
    if io._try_native() is None:
        import pytest

        pytest.skip("native library unavailable")
    io.write_final_state_arrays(p_native, *fields, obs)
    with mock.patch.object(io, "_try_native", lambda: None):
        io.write_final_state_arrays(p_python, *fields, obs)
    assert p_native.read_bytes() == p_python.read_bytes()
