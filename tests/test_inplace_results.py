"""Assert the committed 3-D in-place engine evidence (TPU).

experiments/lbm3d-perf/inplace.csv is produced on the real TPU by its
inplace.py using the production routing (`d3q19_pallas_inplace_blocked.
choose_k`). These tests pin what the committed rows must say: every
shape carries a production-family row well above the two-stream kernel
(~3.0-3.3k MLUPS) and the pure-XLA engine (538), the bench shape sits in
its measured 6.3-6.8k band, and the routing reproduces the slab/blocked
split the sweep measured (slab where its working set fits, the blocked
kernel on 256x256-plane shapes)."""

import csv
import os

import pytest

from lbm_tpu.ops import d3q19_pallas_inplace_blocked as blk

HERE = os.path.dirname(__file__)
CSV_PATH = os.path.join(HERE, "..", "experiments", "lbm3d-perf",
                        "inplace.csv")
SLAB_SHAPES = ("64x128x256", "128x128x128")
BLOCKED_SHAPES = ("32x256x256", "128x256x256")


@pytest.fixture(scope="module")
def rows():
    with open(CSV_PATH) as fp:
        return list(csv.DictReader(fp))


def _family_row(rows, grid):
    got = [r for r in rows
           if r["grid"] == grid
           and r["engine"].startswith("pallas_inplace_")
           and ("slab" in r["engine"] or "blocked" in r["engine"])]
    assert got, f"no production-family row for {grid}"
    return got[0]


def test_all_rows_are_tpu(rows):
    assert rows and all(r["platform"] == "tpu" for r in rows)


def test_production_family_beats_two_stream_everywhere(rows):
    for grid in SLAB_SHAPES + BLOCKED_SHAPES:
        r = _family_row(rows, grid)
        assert r["seconds"] != "failed", r
        assert float(r["mlups"]) > 3500, r  # two-stream tops out ~3.3k


def test_bench_shape_in_measured_band(rows):
    r = _family_row(rows, "64x128x256")
    assert "slab" in r["engine"] and "_k3" in r["engine"]
    assert 6000 < float(r["mlups"]) < 7500, r


def test_routing_matches_recorded_split():
    for grid in SLAB_SHAPES:
        nz, ny, nx = (int(v) for v in grid.split("x"))
        kind, _, _, k = blk.choose_k(nz, ny, nx, num_steps=600)
        assert (kind, k) == ("slab", 3), grid
    for grid in BLOCKED_SHAPES:
        nz, ny, nx = (int(v) for v in grid.split("x"))
        kind, bz, by, k = blk.choose_k(nz, ny, nx, num_steps=600)
        assert (kind, bz, by, k) == ("blocked", 4, 64, 3), grid
