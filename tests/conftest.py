"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), the analogue of the
reference's IPUModel emulator testing (test/codelets/main.cpp uses
poplar::Device::createCPUDevice / IPUModel). The real-TPU benchmark path is
exercised separately by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache (gitignored .jax_cache/, shared with bench):
# the suite's wall time is dominated by CPU jit compiles, and JAX's cache
# keys on the optimised HLO + flags, so source changes recompile correctly
# while unchanged tests rerun warm. The cache has no cross-process write
# atomicity on this image (see CLAUDE.md: interleaved writes can poison an
# entry whose deserialization segfaults) — set LBM_TEST_CACHE_DIR to run
# the suite concurrently with any other jax process using .jax_cache/.
from lbm_tpu.utils import profiling  # noqa: E402

profiling.enable_compilation_cache(os.environ.get(
    "LBM_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))

import pytest  # noqa: E402

REFERENCE_DIR = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")

# Memory-map headroom (round-4 diagnosis): every deserialized XLA:CPU
# executable mmaps its JIT code pages, and the full suite accumulates
# >60k mappings in one process — past the Linux default
# vm.max_map_count=65530 the NEXT compile/cache-load dies (LLVM abort or
# a segfault inside the cache deserializer, at whichever test crosses
# the line; three identical mid-suite crashes before diagnosis). Raise
# the limit when permitted; regardless, shed mappings by clearing JAX's
# in-memory executable caches when close to the ceiling (the persistent
# disk cache makes re-deserialization cheap).


def _max_map_count() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as fh:
            return int(fh.read())
    except OSError:  # non-Linux
        return 1 << 30


def _raise_map_limit(target: int = 262144) -> None:
    if _max_map_count() >= target:
        return
    try:
        with open("/proc/sys/vm/max_map_count", "w") as fh:
            fh.write(str(target))
    except OSError:  # not root — the shedding fixture still protects us
        pass


_raise_map_limit()


@pytest.fixture(autouse=True)
def _map_headroom_guard():
    yield
    try:
        with open("/proc/self/maps") as fh:
            n_maps = sum(1 for _ in fh)
    except OSError:
        return
    if n_maps > _max_map_count() - 12000:
        jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running golden regression (deselect with -m 'not slow')")


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip(f"reference data not available at {REFERENCE_DIR}")
    return REFERENCE_DIR
