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
# while unchanged tests rerun warm
from lbm_tpu.utils import profiling  # noqa: E402

profiling.enable_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import pytest  # noqa: E402

REFERENCE_DIR = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running golden regression (deselect with -m 'not slow')")


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip(f"reference data not available at {REFERENCE_DIR}")
    return REFERENCE_DIR
