"""Assert the committed golden-matrix evidence (full-length TPU f32 runs).

The CSV is produced on the real TPU by experiments/golden-matrix/run.py;
these tests pin what the committed rows must say: every (grid, engine)
pair within its accuracy floor, and verify/check.py passing at the
reference's own 1% tolerance INCLUDING the per-cell final_state gate
(reference: check/check.py:66 — it gates column 5 of the
`x y u_x u_y u pressure obstacle` rows, i.e. pressure; fs_max_rel_err
records the same column) on ALL FOUR grids — the two whose golden blobs
ship upstream plus the two self-minted in repo check/ (round 4,
VERDICT #2; provenance in check/README.md + MINT.csv)."""

import csv
import os

import pytest

CSV_PATH = os.path.join(os.path.dirname(__file__), "..", "experiments",
                        "golden-matrix", "results.csv")
GOLDEN_LINES = {"128x128": 40000, "128x256": 40000, "256x256": 80000,
                "1024x1024": 20000}


@pytest.fixture(scope="module")
def rows():
    with open(CSV_PATH) as fp:
        return list(csv.DictReader(fp))


def test_every_grid_engine_pair_recorded(rows):
    pairs = {(r["grid"], r["engine"]) for r in rows}
    for grid in GOLDEN_LINES:
        for engine in ("jax", "pallas"):
            assert (grid, engine) in pairs


def test_full_length_on_tpu_within_floor(rows):
    for r in rows:
        assert r["platform"] == "tpu"
        assert int(r["steps"]) == GOLDEN_LINES[r["grid"]]
        assert float(r["max_rel_err"]) < float(r["floor"])


def test_final_state_checker_passes_on_all_four_grids(rows):
    assert len(rows) == 8  # 4 grids x 2 engines
    for r in rows:
        assert r["check_pass"] == "1", r
        assert float(r["fs_max_rel_err"]) < 0.01, r
