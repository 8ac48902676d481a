"""Bench output contract: the driver captures EXACTLY 2000 chars of
stdout tail and parses the last line as JSON. Rounds 3 AND 4 both
overflowed that window (r4 budgeted 2200 on a wrong ~3000 assumption)
and were recorded as ``parsed: null`` — these tests pin the 1800-char
budget as a LITERAL so a bad constant can't self-certify."""

from __future__ import annotations

import importlib.util
import json

_spec = importlib.util.spec_from_file_location("bench", "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_compact_line_fits_capture_window():
    # worst case: every registered query present with a long name
    timings = {f"some_rather_long_query_name_{i:04d}": i * 0.123 for i in range(200)}
    line = bench._compact_line(99.9, timings, 0.1)
    # LITERAL bound: the driver tail is exactly 2000 chars; 1800 leaves
    # headroom. Do not replace with `<= bench._LINE_BUDGET` — r4's test
    # did that and let a too-large constant (2200) pass itself.
    assert len(line) <= 1800
    assert bench._LINE_BUDGET <= 1800

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == 99.9
    assert parsed["n_queries"] == 200
    assert parsed["queries_elided"] + len(parsed["queries"]) == 200
    # slowest-first retention: every kept entry >= every elided one
    kept = set(parsed["queries"])
    kept_min = min(parsed["queries"].values())
    elided_max = max(
        (t for n, t in timings.items() if n not in kept), default=float("-inf")
    )
    assert kept_min >= round(elided_max, 2) - 0.01


def test_compact_line_small_set_keeps_everything():
    timings = {"q1": 1.5, "q2": 0.25}
    parsed = json.loads(bench._compact_line(1.75, timings, 0.01))
    assert parsed["queries"] == {"q1": 1.5, "q2": 0.25}
    assert parsed["queries_elided"] == 0


def test_headline_names_are_registered():
    from pyspark_postgres_loader_spark.registry import all_queries

    registered = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in registered]
    assert not missing, f"HEADLINE names not registered: {missing}"


def test_compact_line_reports_error_count():
    line = bench._compact_line(1.0, {"q": 1.0}, 0.1, n_errors=3)
    assert json.loads(line)["n_errors"] == 3
    assert len(line) <= 1800


def test_compact_line_budget_holds_for_any_timings():
    """Property: whatever the registry grows into (many queries, long
    names, large/odd durations), the stdout line stays parseable and
    under the 1800-char capture budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=60
    )
    timings = st.dictionaries(
        name, st.floats(0, 1e6, allow_nan=False), min_size=0, max_size=400
    )

    @settings(max_examples=200, deadline=None)
    @given(timings=timings, total=st.floats(0, 1e9, allow_nan=False), n_err=st.integers(0, 999))
    def check(timings, total, n_err):
        line = bench._compact_line(round(total, 3), timings, 0.1, n_err)
        assert len(line) <= 1800
        parsed = json.loads(line)
        assert parsed["n_queries"] == len(timings)
        assert parsed["n_errors"] == n_err
        assert parsed["queries_elided"] == len(timings) - len(parsed["queries"])

    check()


def test_compact_line_carries_pass_variance():
    line = bench._compact_line(3.0, {"q": 1.0}, 0.1, 0, [3.2, 3.0, 3.1])
    parsed = json.loads(line)
    assert parsed["passes"] == 3
    assert parsed["pass_totals_sec"] == [3.2, 3.0, 3.1]
    assert abs(parsed["spread_sec"] - 0.2) < 1e-9
    assert len(line) <= 1800


def test_compact_line_budget_holds_with_pass_totals():
    timings = {f"some_rather_long_query_name_{i:04d}": i * 0.123 for i in range(200)}
    line = bench._compact_line(99.9, timings, 0.1, 5, [123456.789] * 3)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["queries_elided"] + len(parsed["queries"]) == 200


def test_fastpath_stable_set_rules():
    """Stability = median-normalized flatness within ±10% over the
    last 3 rounds AT THE SAME sf; short or off-sf history yields no
    fast path."""
    # q_flat: absolute values drift 2x but track each round's median
    # exactly -> stable. q_jumpy: moves 30% against the median -> not.
    hist = {
        "r01": {"sf": 0.1, "queries": {"q_flat": 1.0, "q_jumpy": 1.0,
                                       "q_med": 1.0}},
        "r02": {"sf": 0.1, "queries": {"q_flat": 2.0, "q_jumpy": 2.6,
                                       "q_med": 2.0}},
        "r03": {"sf": 0.1, "queries": {"q_flat": 1.5, "q_jumpy": 1.5,
                                       "q_med": 1.5}},
    }
    stable, latest = bench._stable_set(hist, 0.1)
    assert "q_flat" in stable and "q_med" in stable
    assert "q_jumpy" not in stable
    assert latest["q_flat"] == 1.5
    # off-sf: the same history must not qualify an sf0.001 run
    assert bench._stable_set(hist, 0.001) == (set(), {})
    # short history: two rounds are not enough
    short = {k: hist[k] for k in ("r01", "r02")}
    assert bench._stable_set(short, 0.1) == (set(), {})
    # a query missing from one round is not in the common set
    hist["r02"]["queries"].pop("q_med")
    stable2, _ = bench._stable_set(hist, 0.1)
    assert "q_med" not in stable2


def test_fastpath_history_append_guards_sf(tmp_path, monkeypatch):
    """Only canonical sf0.1 runs become history rounds — an ad-hoc
    small-sf run must not shift the round labels or the criterion."""
    import os

    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda _p: str(tmp_path))
    hist = {"r05": {"sf": 0.1, "queries": {"a": 1.0}}}
    bench._append_history(hist, {"a": 9.9}, 0.001)
    assert not os.path.exists(tmp_path / "BENCH_HISTORY.json")
    bench._append_history(hist, {"a": 1.1}, 0.1)
    got = json.load(open(tmp_path / "BENCH_HISTORY.json"))["rounds"]
    assert got["r06"] == {"sf": 0.1, "queries": {"a": 1.1}}
    assert got["r05"]["queries"] == {"a": 1.0}


def test_fastpath_repo_history_is_loadable():
    """The committed bootstrap history drives a non-trivial fast path
    at the canonical sf."""
    hist = bench._load_history()
    stable, latest = bench._stable_set(hist, 0.1)
    assert len(stable) >= 30
    assert all(latest[n] > 0 for n in stable)
