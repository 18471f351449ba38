"""Assert the committed golden-matrix evidence (full-length TPU f32 runs).

The CSV is produced on the real TPU by experiments/golden-matrix/run.py;
these tests pin what the committed rows must say: every (grid, engine)
pair within its accuracy floor, and — for the grids whose golden
final_state blobs ship with the reference — verify/check.py passing at
the reference's own 1% tolerance INCLUDING the per-cell final_state gate
(reference: check/check.py:66 — it gates column 5 of the
`x y u_x u_y u pressure obstacle` rows, i.e. pressure; fs_max_rel_err
records the same column)."""

import csv
import os

import pytest

CSV_PATH = os.path.join(os.path.dirname(__file__), "..", "experiments",
                        "golden-matrix", "results.csv")
FS_GRIDS = {"128x128", "128x256"}


@pytest.fixture(scope="module")
def rows():
    with open(CSV_PATH) as fp:
        return list(csv.DictReader(fp))


def test_every_grid_engine_pair_recorded(rows):
    pairs = {(r["grid"], r["engine"]) for r in rows}
    for grid in ("128x128", "128x256", "256x256"):
        for engine in ("jax", "pallas"):
            assert (grid, engine) in pairs


def test_full_length_on_tpu_within_floor(rows):
    golden_lines = {"128x128": 40000, "128x256": 40000, "256x256": 80000}
    for r in rows:
        assert r["platform"] == "tpu"
        assert int(r["steps"]) == golden_lines[r["grid"]]
        assert float(r["max_rel_err"]) < float(r["floor"])


def test_final_state_checker_passes_at_reference_tolerance(rows):
    fs_rows = [r for r in rows if r["grid"] in FS_GRIDS]
    assert len(fs_rows) == 4  # 2 grids x 2 engines
    for r in fs_rows:
        assert r["check_pass"] == "1", r
        assert float(r["fs_max_rel_err"]) < 0.01, r
