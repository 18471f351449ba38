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


def test_guard_decision_covers_driver_env_shape():
    """The r01/r02 failure: forced-count flag present and JAX_PLATFORMS=cpu
    exported, but the axon plugin ignores the env var so jax.devices() is one
    real TPU chip. The guard must look at device reality, not the config."""
    import __graft_entry__ as g

    # driver env shape (r02 failure): flags forced, but backend is 1 TPU
    assert not g._should_run_in_process(8, forced_count=8,
                                        device_count=1, device_platform="tpu")
    # r01 failure shape: nothing forced, 1 TPU
    assert not g._should_run_in_process(8, 0, 1, "tpu")
    # conftest shape: 8 virtual CPU devices live -> in-process OK
    assert g._should_run_in_process(8, 8, 8, "cpu")
    # forced but the flag arrived after backend init (fewer live devices)
    assert not g._should_run_in_process(8, 8, 4, "cpu")
    # live CPU devices but no forcing recorded: re-exec to be safe
    assert not g._should_run_in_process(8, 0, 8, "cpu")


def test_dryrun_multichip_exits_zero_in_driver_env():
    """Exact MULTICHIP driver env: JAX_PLATFORMS=cpu exported AND the forced
    device count in XLA_FLAGS. On a host with the axon TPU plugin the env var
    is ignored and the backend is one TPU chip — the shape that crashed
    rounds 1 and 2. Must exit 0 regardless of which backend resolves."""
    env = _clean_env()
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "pallas_sharded" in proc.stdout
    # round-4 hardening: no REAL machine-feature mismatches may survive
    # (XLA's +prefer-* tuning pseudo-features warn benignly on same-host
    # loads; anything else is foreign machine code = SIGILL risk,
    # MULTICHIP_r03)
    import __graft_entry__ as g

    assert g._real_aot_feature_mismatches(proc.stderr) == [], \
        proc.stderr[-2000:]


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
    import __graft_entry__ as g

    assert g._real_aot_feature_mismatches(proc.stderr) == [], \
        proc.stderr[-2000:]


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


def test_real_aot_feature_mismatch_classifier():
    """+prefer-* tuning pseudo-features are benign same-host noise; any
    other cpu_aot_loader feature mismatch is foreign machine code."""
    import __graft_entry__ as g

    benign = ("E0818 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
              "Target machine feature +prefer-no-gather is not  supported "
              "on the host machine.\n"
              "E0818 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
              "Target machine feature +prefer-no-scatter is not supported.")
    assert g._real_aot_feature_mismatches(benign) == []
    real = benign + ("\nE0818 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
                     "result. Target machine feature +avx512bf16 is not "
                     " supported on the host machine.")
    assert g._real_aot_feature_mismatches(real) == ["avx512bf16"]
    assert g._real_aot_feature_mismatches("") == []
