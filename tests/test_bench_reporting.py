"""bench.py must surface pallas-engine failures, never swallow them.

Round-1 advisor finding: a crashed/miscompiled pallas subprocess silently
degraded the headline number to the jax engine with no diagnostic. The
subprocess runner now returns (seconds, error) and main() emits a
`pallas_error` field.
"""

import inspect
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench  # noqa: E402


def test_subprocess_nonzero_rc_is_reported():
    secs, err = bench.run_pallas_subprocess(
        cmd=[sys.executable, "-c", "import sys; sys.stderr.write('boom'); sys.exit(3)"],
        timeout=60,
    )
    assert secs is None
    assert "rc=3" in err and "boom" in err


def test_subprocess_timeout_is_reported():
    secs, err = bench.run_pallas_subprocess(
        cmd=[sys.executable, "-c", "import time; time.sleep(30)"], timeout=1,
    )
    assert secs is None
    assert "timeout" in err


def test_subprocess_missing_json_is_reported():
    secs, err = bench.run_pallas_subprocess(
        cmd=[sys.executable, "-c", "print('hello')"], timeout=60,
    )
    assert secs is None
    assert "no JSON line" in err


def test_subprocess_good_json_is_parsed():
    info, err = bench.run_pallas_subprocess(
        cmd=[sys.executable, "-c",
             "print('{\"seconds\": 1.5, \"repeats\": [1.5, 1.6]}')"],
        timeout=60,
    )
    assert err is None
    assert info["seconds"] == 1.5
    assert info["repeats"] == [1.5, 1.6]  # extra keys ride along


def test_subprocess_json_without_seconds_is_rejected():
    # every subprocess entry point's JSON must carry "seconds"; a line
    # that parses but lacks it is a contract bug, not a timing
    info, err = bench.run_pallas_subprocess(
        cmd=[sys.executable, "-c", "print('{\"minutes\": 1.5}')"], timeout=60,
    )
    assert info is None
    assert "bad subprocess JSON" in err


def test_main_emits_pallas_error_field():
    src = inspect.getsource(bench.main)
    assert '"pallas_error"' in src


def test_main_emits_secondary_metric_error_fields():
    src = inspect.getsource(bench.main)
    assert '"d3q19_error"' in src
    assert '"d2q9_4096_error"' in src
    assert '"d2q9_manual_error"' in src
    assert '"d2q9_inplace_error"' in src
    assert '"blur_error"' in src


def test_main_emits_repeats_block():
    # round-5 VERDICT #6: per-candidate raw repeat timings must land in
    # the bench JSON so round-over-round deltas are attributable to
    # tunnel noise vs real drift from the artifact alone
    src = inspect.getsource(bench.main)
    assert 'out["repeats"]' in src
    for key in ('"jax"', '"pallas_k4"', '"d3q19"', '"d3q19_blocked"',
                '"d2q9_4096"', '"pallas_manual_k4"', '"pallas_inplace_k4"'):
        assert f"repeats[{key}]" in src, key


def test_manual_metric_runs_last():
    # the manual engine runs last so a failure (even a worker wedge)
    # cannot cost any other metric; only on success does it join the
    # headline candidate set
    src = inspect.getsource(bench.main)
    assert src.index('"d2q9_manual_') > src.index('"d2q9_4096_')
    assert src.index('"d2q9_manual_') > src.index('"d3q19_')


def test_manual_success_joins_headline_candidates():
    # clean manual/inplace runs must be able to claim the headline (they
    # pass the same golden-prefix gate), and the recomputed value must
    # stay consistent with the winning engine's seconds
    src = inspect.getsource(bench.main)
    assert 'results["pallas_manual_k4"]' in src
    assert 'results["pallas_inplace_k4"]' in src
    assert src.index('results["pallas_manual_k4"]') > \
        src.index('"d2q9_manual_mlups"')
    # the inplace subprocess runs last of all
    assert src.index('"d2q9_inplace_') > src.index('"d2q9_manual_')


def test_preflight_passes_on_quick_op(capsys):
    assert bench._tunnel_preflight(
        timeout_s=30, cmd=[sys.executable, "-c", "pass"])
    assert capsys.readouterr().out == ""


def test_preflight_times_out_with_headline_error_json(capsys):
    import json

    assert not bench._tunnel_preflight(
        timeout_s=1,
        cmd=[sys.executable, "-c", "import time; time.sleep(10)"])
    line = capsys.readouterr().out.strip()
    out = json.loads(line)
    assert out["value"] == 0.0
    assert "unresponsive" in out["error"]


def test_preflight_reports_crash_rc(capsys):
    import json

    assert not bench._tunnel_preflight(
        timeout_s=30, cmd=[sys.executable, "-c", "raise SystemExit(7)"])
    out = json.loads(capsys.readouterr().out.strip())
    assert "rc=7" in out["error"]


def test_main_runs_preflight_first():
    src = inspect.getsource(bench.main)
    assert "_tunnel_preflight" in src.split("_setup()")[0]


def test_blur_runs_after_core_secondaries_before_headline_candidates():
    # blur is informational-only: it must not displace the d3q19/4096
    # secondaries on failure, and it never joins the headline set
    src = inspect.getsource(bench.main)
    assert src.index('"blur_') > src.index('"d2q9_4096_')
    assert src.index('"blur_') < src.index('"d2q9_manual_')


import pytest  # noqa: E402


@pytest.mark.slow
def test_blur_only_smoke(monkeypatch, capsys):
    # full flow off-TPU: parity gates + differential windows in smoke mode
    # (interpret-mode kernels; the reported us/pass is meaningless here)
    import json

    monkeypatch.setenv("LBM_BENCH_BLUR_SMOKE", "1")
    assert bench.blur_only() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert "seconds" in out
    assert out["resident_us_per_pass"] > 0
    assert out["pallas_leaf_us_per_pass"] > 0
    gates = out["parity_max_abs_err_8_passes"]
    assert gates["resident"] <= 1e-4 and gates["pallas"] <= 1e-4
