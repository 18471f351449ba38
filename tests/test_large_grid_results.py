"""Assert the committed large-grid evidence (TPU, production selector).

experiments/large-grid/results.csv is produced on the real TPU by its
run.py using `d2q9_pallas.choose_config`; these tests pin what the
committed rows must say: every grid present, the pallas engine beating
the north-star (2,000 MLUPS) by >= 5x at every size, and the selector
reproducing the (band, K) pairs the sweep measured best (sweepk8.csv)."""

import csv
import os

import pytest

from lbm_tpu.ops import d2q9_pallas

HERE = os.path.dirname(__file__)
CSV_PATH = os.path.join(HERE, "..", "experiments", "large-grid",
                        "results.csv")
GRIDS = ("1024x1024", "2048x2048", "4096x4096", "8192x8192")


@pytest.fixture(scope="module")
def rows():
    with open(CSV_PATH) as fp:
        return list(csv.DictReader(fp))


def test_every_grid_recorded_on_tpu(rows):
    pairs = {(r["grid"], r["engine"]) for r in rows}
    for grid in GRIDS:
        assert (grid, "jax") in pairs
        assert (grid, "pallas_auto") in pairs
    assert all(r["platform"] == "tpu" for r in rows)


def test_production_selector_beats_north_star_everywhere(rows):
    for r in rows:
        if r["engine"] != "pallas_auto":
            continue
        assert r["seconds"] != "failed", r
        assert float(r["mlups"]) >= 5 * 2000, r  # >= 5x the north-star


def test_selector_reproduces_swept_optima():
    """The committed rows were measured with these configs; drift in
    choose_config must show up here, not silently re-label the CSV."""
    assert d2q9_pallas.choose_config(1024, 1024) == (128, 4)
    assert d2q9_pallas.choose_config(2048, 2048) == (128, 8)
    assert d2q9_pallas.choose_config(4096, 4096) == (64, 8)
    assert d2q9_pallas.choose_config(8192, 8192) == (32, 8)
