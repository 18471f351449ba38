"""Profiling/AOT utilities (the observability subsystem)."""

import jax.numpy as jnp
import numpy as np

from lbm_tpu.utils import profiling


def test_timed_prints(capsys):
    import sys

    with profiling.timed("unit test step", file=sys.stdout):
        pass
    assert "unit test step took" in capsys.readouterr().out


def test_dump_hlo(tmp_path):
    def fn(x):
        return jnp.sin(x) * 2.0

    text = profiling.dump_hlo(fn, jnp.ones((8, 128)), path=tmp_path / "m.txt")
    assert "sine" in text or "sin" in text
    assert (tmp_path / "m.txt").exists()


def test_aot_compile_runs():
    def fn(x):
        return x @ x.T

    compiled = profiling.aot_compile(fn, jnp.ones((16, 16)))
    out = compiled(jnp.ones((16, 16)))
    np.testing.assert_allclose(np.asarray(out), np.full((16, 16), 16.0))
    assert compiled.cost_analysis() is not None


def test_compilation_cache_round_trip(tmp_path):
    profiling.enable_compilation_cache(tmp_path / "cache")

    def fn(x):
        return x + 12345.0

    _ = np.asarray(jax_jit_run(fn))
    # something was persisted
    assert any((tmp_path / "cache").iterdir())


def jax_jit_run(fn):
    import jax

    return jax.jit(fn)(jnp.ones((256, 256)))


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert len(stats) >= 1
