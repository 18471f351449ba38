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
