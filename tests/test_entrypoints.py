"""Driver entry-point regression tests.

Round-1 post-mortem: the driver ran `dryrun_multichip(8)` in the real-TPU
environment (1 visible device, no XLA_FLAGS forcing) and it crashed
(MULTICHIP_r01.json ok=false). The function must be self-sufficient: these
tests reproduce the driver's clean environment in a subprocess and assert
exit 0.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Environment as the driver would have it: no forced CPU device count,
    no platform override (but keep the CPU platform pin if the host has no
    TPU — the point is the *device count* forcing, which round 1 missed)."""
    env = dict(os.environ)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", "")).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_exits_zero_in_clean_env():
    # exactly what MULTICHIP_r*.json records
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "pallas_sharded" in proc.stdout


def test_dryrun_multichip_in_process_with_forced_devices():
    # the conftest already forces 8 virtual CPU devices: must run in-process
    # (no subprocess respawn) and succeed
    import __graft_entry__ as g

    assert g._forced_cpu_device_count() >= 8
    g.dryrun_multichip(8)


def test_entry_is_jittable():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
