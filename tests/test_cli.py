"""CLI smoke tests: every command surface runs end-to-end on CPU.

The analogue of the reference's CMake-built driver executables being exercised
by the experiment scripts — here each CLI is invoked as a user would.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")

needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")


def run_cli(args, timeout=240):
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, "-m", *args], capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )


@needs_ref
def test_lbm_cli(tmp_path):
    res = run_cli([
        "lbm_tpu.cli.lbm", "--params", f"{REF}/params/input_128x128.params",
        "--obstacles", f"{REF}/params/obstacles_128x128.dat",
        "--device", "cpu", "--num-steps", "10", "--out-dir", str(tmp_path),
    ])
    assert res.returncode == 0, res.stderr
    assert "==done==" in res.stdout
    assert (tmp_path / "av_vels.dat").exists()
    assert (tmp_path / "final_state.dat").exists()


@needs_ref
def test_lbm_cli_compile_only_and_runner(tmp_path):
    """One exported executable serves ANY obstacle file: compiled WITHOUT
    --obstacles (reference: 'no obstacles needed to build!',
    main/LbmPoplibs.cpp:252), then run against two different masks, each
    matching a direct simulation of the same mask."""
    exe = tmp_path / "step.jaxexe"
    res = run_cli([
        "lbm_tpu.cli.lbm", "--params", f"{REF}/params/input_128x128.params",
        "--device", "cpu", "--compile-only", "--export", str(exe),
    ])
    assert res.returncode == 0, res.stderr
    assert exe.exists() and exe.stat().st_size > 0

    # second obstacle file: the reference one plus an extra block
    alt = tmp_path / "obstacles_alt.dat"
    extra = "".join(f"{x} {y} 1\n" for x in range(60, 70) for y in range(60, 70))
    alt.write_text(Path(f"{REF}/params/obstacles_128x128.dat").read_text() + extra)

    avs = {}
    for name, obst in (("ref", f"{REF}/params/obstacles_128x128.dat"),
                       ("alt", str(alt))):
        out = tmp_path / name
        res = run_cli([
            "lbm_tpu.cli.lbm_runner", "--exe", str(exe),
            "--params", f"{REF}/params/input_128x128.params",
            "--obstacles", obst,
            "--device", "cpu", "--num-steps", "5", "--out-dir", str(out),
        ])
        assert res.returncode == 0, res.stderr
        assert "==done==" in res.stdout
        direct = run_cli([
            "lbm_tpu.cli.lbm", "--params", f"{REF}/params/input_128x128.params",
            "--obstacles", obst,
            "--device", "cpu", "--num-steps", "5",
            "--out-dir", str(out / "direct"),
        ])
        assert direct.returncode == 0, direct.stderr
        import numpy as np

        got = np.loadtxt(out / "av_vels.dat", usecols=1, delimiter="\t")
        want = np.loadtxt(out / "direct" / "av_vels.dat", usecols=1,
                          delimiter="\t")
        # the exported exe lowers the step behind a call boundary, so the
        # reduction order can differ from the inline jit by ~1 ulp
        np.testing.assert_allclose(got, want, rtol=1e-5)
        avs[name] = got
    assert not np.array_equal(avs["ref"], avs["alt"])  # mask is a runtime input


@needs_ref
def test_blur_cli(tmp_path):
    out = tmp_path / "out.png"
    res = run_cli([
        "lbm_tpu.cli.blur", "-i", f"{REF}/images/test-small.png",
        "-o", str(out), "-n", "3", "--device", "cpu", "--engine", "resident",
    ])
    assert res.returncode == 0, res.stderr
    assert out.exists()


@needs_ref
def test_blur_cli_sharded(tmp_path):
    out = tmp_path / "out.png"
    res = run_cli([
        "lbm_tpu.cli.blur", "-i", f"{REF}/images/test-small.png",
        "-o", str(out), "-n", "3", "--engine", "conv-sharded",
        "--num-devices", "8", "--device", "cpu",
    ])
    assert res.returncode == 0, res.stderr
    assert out.exists() and out.stat().st_size > 0


@needs_ref
def test_blur_cli_compile_only(tmp_path):
    exe = tmp_path / "stencil.jaxexe"
    res = run_cli([
        "lbm_tpu.cli.blur", "-i", f"{REF}/images/test-small.png",
        "--device", "cpu", "--compile-only", "--export", str(exe),
    ])
    assert res.returncode == 0, res.stderr
    assert "flops/pass" in res.stdout
    assert exe.exists() and exe.stat().st_size > 0


def test_viz_partition_cli(tmp_path):
    res = run_cli([
        "lbm_tpu.cli.viz_partition", "--ny", "64", "--nx", "64",
        "--num-devices", "4", "-o", str(tmp_path / "p.png"),
        "--json", str(tmp_path / "p.json"),
    ])
    assert res.returncode == 0, res.stderr
    assert "load balance" in res.stdout
    assert (tmp_path / "p.png").exists()
    assert (tmp_path / "p.json").exists()


def test_viz_partition_lane_overlay(tmp_path):
    """3-level render: device blocks + bands + the 8x128 VPU lane grid,
    with partial-tile (wasted-lane) cells tinted red."""
    from lbm_tpu.cli import viz_partition
    from lbm_tpu.parallel import partition

    part = partition.partition_for_devices(20, 140, 2)
    assert partition.stats(part).wasted_lane_cells > 0
    base = viz_partition.render(part, 20, 140)
    lanes = viz_partition.render(part, 20, 140, lanes=True)
    assert lanes.shape == base.shape
    # red tint on partial-tile cells
    assert (lanes[..., 0].astype(int) - base[..., 0].astype(int) >= 100).any()
    res = run_cli([
        "lbm_tpu.cli.viz_partition", "--ny", "64", "--nx", "200",
        "--num-devices", "4", "--lanes", "-o", str(tmp_path / "l.png"),
    ])
    assert res.returncode == 0, res.stderr
    assert (tmp_path / "l.png").exists()


def test_partition_stats_cli():
    res = run_cli(["lbm_tpu.cli.partition_stats", "--samples", "3",
                   "--devices", "1,4"])
    assert res.returncode == 0, res.stderr
    assert res.stdout.startswith("ny,nx,num_devices")


def test_halo_bench_cli():
    env = dict(os.environ, PYTHONPATH=str(REPO),
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    res = subprocess.run(
        [sys.executable, "-m", "lbm_tpu.cli.halo_bench", "--ny", "64",
         "--nx", "64", "-n", "3", "--device", "cpu",
         "--strategies", "implicit,ppermute"],
        capture_output=True, text=True, timeout=240, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr
    assert "ppermute" in res.stdout


def test_lbm3d_cli(tmp_path):
    res = run_cli([
        "lbm_tpu.cli.lbm3d", "--nz", "8", "--ny", "8", "--nx", "16",
        "-n", "5", "--device", "cpu", "--out-dir", str(tmp_path),
    ])
    assert res.returncode == 0, res.stderr
    assert "==done==" in res.stdout
    assert (tmp_path / "av_vels_3d.dat").exists()


@needs_ref
def test_flow_viz_cli(tmp_path):
    # produce a final_state quickly, then render two fields
    res = run_cli([
        "lbm_tpu.cli.lbm", "--params", f"{REF}/params/input_128x128.params",
        "--obstacles", f"{REF}/params/obstacles_128x128.dat",
        "--device", "cpu", "--num-steps", "50", "--out-dir", str(tmp_path),
    ])
    assert res.returncode == 0, res.stderr
    for field in ("speed", "vorticity"):
        out = tmp_path / f"{field}.png"
        res = run_cli([
            "lbm_tpu.cli.flow_viz", str(tmp_path / "final_state.dat"),
            "-o", str(out), "--field", field,
        ])
        assert res.returncode == 0, res.stderr
        assert out.exists() and out.stat().st_size > 0


@needs_ref
def test_lbm_cli_sharded_overlap(tmp_path):
    """Round 4: the 2-D row-exchange/compute overlap surface end-to-end
    (4 row-shards x 32 rows on the 128x128 grid)."""
    res = run_cli([
        "lbm_tpu.cli.lbm", "--params", f"{REF}/params/input_128x128.params",
        "--obstacles", f"{REF}/params/obstacles_128x128.dat",
        "--device", "cpu", "--num-steps", "8", "--out-dir", str(tmp_path),
        "--engine", "sharded-pallas", "--num-devices", "4", "--overlap",
    ])
    assert res.returncode == 0, res.stderr
    assert "==done==" in res.stdout
    base = run_cli([
        "lbm_tpu.cli.lbm", "--params", f"{REF}/params/input_128x128.params",
        "--obstacles", f"{REF}/params/obstacles_128x128.dat",
        "--device", "cpu", "--num-steps", "8", "--out-dir",
        str(tmp_path / "fused"), "--engine", "sharded-pallas",
        "--num-devices", "4",
    ])
    assert base.returncode == 0, base.stderr
    import numpy as np

    a = np.loadtxt(tmp_path / "av_vels.dat", usecols=1)
    b = np.loadtxt(tmp_path / "fused" / "av_vels.dat", usecols=1)
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # the state is bit-identical between overlap and fused
    fa = np.loadtxt(tmp_path / "final_state.dat")
    fb = np.loadtxt(tmp_path / "fused" / "final_state.dat")
    np.testing.assert_array_equal(fa, fb)


def test_strategy_choices_match_halo_exchanges():
    """Lock cli.lbm --strategy to the library strategy set (round-5 VERDICT
    #7: the CLI silently omitted 'manytensors' while halo.EXCHANGES and
    halo_bench both had it). The contract: the CLI exposes 'implicit' plus
    every halo.EXCHANGES entry except the physically-wrong 'none'."""
    from lbm_tpu.cli.lbm import STRATEGY_CHOICES
    from lbm_tpu.parallel import halo

    expected = {"implicit"} | (set(halo.EXCHANGES) - {"none"})
    assert set(STRATEGY_CHOICES) == expected
    assert len(STRATEGY_CHOICES) == len(set(STRATEGY_CHOICES))
