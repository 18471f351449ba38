"""Assert the committed D3Q19 long-horizon drift evidence (round-5
VERDICT #4).

The 2-D side has full-golden-length TPU accuracy evidence on every grid
(golden-matrix); until round 5 the 3-D anchor stopped at 200 steps while
the 2-D data shows f32 error grows roughly linearly with horizon. The CSV
is produced on the real TPU by experiments/d3q19-drift/run.py against
6000-step native-f64 oracle traces (minted by mint.py, each cross-checked
vs the JAX f64 engine to ~1e-12 — mint.csv); one shape per production
kernel route so BOTH the slab and the (z,y)-blocked in-place kernels carry
full-length drift evidence. Methodology analogue:
/root/reference/check/check.py:106-129."""

import csv
import os

import pytest

HERE = os.path.join(os.path.dirname(__file__), "..", "experiments",
                    "d3q19-drift")
SHAPES = {"16x64x128": "slab", "8x256x256": "blocked"}
STEPS = 6000


@pytest.fixture(scope="module")
def rows():
    with open(os.path.join(HERE, "results.csv")) as fp:
        return list(csv.DictReader(fp))


def test_both_kernel_routes_and_oracle_engine_recorded(rows):
    triples = {(r["shape"], r["engine"], r["route"]) for r in rows}
    for shape, route in SHAPES.items():
        for engine in ("jax", "pallas-inplace"):
            assert (shape, engine, route) in triples


def test_full_length_on_tpu_within_floor(rows):
    assert len(rows) == 4  # 2 shapes x 2 engines
    for r in rows:
        assert r["platform"] == "tpu", r
        assert int(r["steps"]) == STEPS, r
        assert r["check_pass"] == "1", r
        assert float(r["max_rel_err"]) < float(r["floor"]), r


def test_oracle_traces_cross_checked(rows):
    with open(os.path.join(HERE, "mint.csv")) as fp:
        mint = {r["shape"]: r for r in csv.DictReader(fp)}
    for shape, route in SHAPES.items():
        assert mint[shape]["route"] == route
        assert float(mint[shape]["prefix_rel_err_vs_jax_f64"]) < 1e-11
        trace = os.path.join(HERE, mint[shape]["trace_file"])
        assert os.path.exists(trace)
