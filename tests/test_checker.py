"""verify/check.py behaviour: pass, fail, and mismatch paths."""

import importlib.util
import sys
from pathlib import Path

import pytest

spec = importlib.util.spec_from_file_location(
    "check", Path(__file__).resolve().parent.parent / "verify" / "check.py"
)
check = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check)


def write_case(tmp_path, av_vals, fs_rows, prefix):
    av = tmp_path / f"{prefix}_av.dat"
    fs = tmp_path / f"{prefix}_fs.dat"
    av.write_text("".join(f"{i}:\t{v:.12E}\n" for i, v in enumerate(av_vals)))
    fs.write_text("".join(
        f"{x} {y} 0.0E+00 0.0E+00 {u:.12E} {p:.12E} 0\n"
        for (x, y, u, p) in fs_rows
    ))
    return av, fs


def args_for(ref, sim):
    return [
        "--ref-av-vels-file", str(ref[0]), "--ref-final-state-file", str(ref[1]),
        "--av-vels-file", str(sim[0]), "--final-state-file", str(sim[1]),
    ]


def test_identical_files_pass(tmp_path, capsys):
    ref = write_case(tmp_path, [1e-5, 2e-5], [(0, 0, 0.1, 0.03), (1, 0, 0.2, 0.03)], "r")
    assert check.main(args_for(ref, ref)) == 0
    assert "Both tests passed!" in capsys.readouterr().out


def test_within_tolerance_passes(tmp_path):
    ref = write_case(tmp_path, [1e-5], [(0, 0, 0.1, 0.03)], "r")
    sim = write_case(tmp_path, [1.005e-5], [(0, 0, 0.1, 0.0301)], "s")
    assert check.main(args_for(ref, sim)) == 0  # default 1%
    assert check.main(["--tolerance", "0.1", *args_for(ref, sim)]) == 1


def test_av_vels_failure(tmp_path, capsys):
    ref = write_case(tmp_path, [1e-5], [(0, 0, 0.1, 0.03)], "r")
    sim = write_case(tmp_path, [2e-5], [(0, 0, 0.1, 0.03)], "s")
    assert check.main(args_for(ref, sim)) == 1
    assert "av_vels failed check" in capsys.readouterr().out


def test_coordinate_mismatch(tmp_path, capsys):
    ref = write_case(tmp_path, [1e-5], [(0, 0, 0.1, 0.03)], "r")
    sim = write_case(tmp_path, [1e-5], [(5, 7, 0.1, 0.03)], "s")
    assert check.main(args_for(ref, sim)) == 1
    assert "coordinates" in capsys.readouterr().out


def test_step_count_mismatch(tmp_path, capsys):
    ref = write_case(tmp_path, [1e-5, 2e-5], [(0, 0, 0.1, 0.03)], "r")
    sim = write_case(tmp_path, [1e-5], [(0, 0, 0.1, 0.03)], "s")
    assert check.main(args_for(ref, sim)) == 1
    assert "number of steps" in capsys.readouterr().out


def test_mint_golden_smoke_and_gz_blobs():
    """verify/mint_golden.py end-to-end on a short prefix (writes nothing)
    + the committed self-golden .gz blobs exist with MINT.csv evidence."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        pytest.skip("no reference data")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "verify", "mint_golden.py"),
         "--grid", "128x128", "--device", "cpu", "--num-steps", "120"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "writing nothing" in proc.stdout
    for grid in ("256x256", "1024x1024"):
        blob = os.path.join(repo, "check", f"{grid}.final_state.dat.gz")
        assert os.path.exists(blob), blob
    mint = open(os.path.join(repo, "check", "MINT.csv")).read()
    assert "256x256,80000" in mint and "1024x1024,20000" in mint
    # every committed evidence row passed the mint gates
    for line in mint.strip().splitlines()[1:]:
        cols = line.split(",")
        assert float(cols[3]) < 1e-9   # av_vs_golden_max_rel
        assert float(cols[7]) < 1e-10  # fs_worst_field_rel
