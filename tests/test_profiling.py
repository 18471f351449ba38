"""Profiling/AOT utilities (the observability subsystem)."""

import re

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
    import jax

    prev = jax.config.jax_compilation_cache_dir  # conftest's global cache
    try:
        profiling.enable_compilation_cache(tmp_path / "cache")

        def fn(x):
            return x + 12345.0

        _ = np.asarray(jax_jit_run(fn))
        # something was persisted
        assert any((tmp_path / "cache").iterdir())
    finally:
        if prev:
            profiling.enable_compilation_cache(prev)


def jax_jit_run(fn):
    import jax

    return jax.jit(fn)(jnp.ones((256, 256)))


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert len(stats) >= 1


def test_select_platform_cpu_and_mismatch(monkeypatch):
    """'cpu' pins the config; 'tpu' must NOT set jax_platforms (the TPU
    backend registers as 'axon' in this image, so jax_platforms='tpu'
    would fail to init) — it verifies the resolved platform instead."""
    import jax
    import pytest

    profiling.select_platform(None)  # no-op
    profiling.select_platform("cpu")
    assert "cpu" in str(jax.config.jax_platforms)
    # conftest pins this process to CPU, so asking for tpu must raise the
    # descriptive mismatch error (never touching jax_platforms)
    with pytest.raises(RuntimeError, match="resolved"):
        profiling.select_platform("tpu")
    assert "tpu" not in str(jax.config.jax_platforms)


def test_cache_dir_is_host_keyed():
    """Round-4 fix for the MULTICHIP_r03 hazard: CPU AOT cache artifacts
    embed host machine features JAX does not key on; the cache dir must be
    namespaced by host_fingerprint so a migrated working tree never loads
    foreign machine code."""
    import jax

    fp = profiling.host_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{12}", fp)
    assert fp == profiling.host_fingerprint()  # stable within a host
    cur = jax.config.jax_compilation_cache_dir
    assert cur and f"host-{fp}" in cur
