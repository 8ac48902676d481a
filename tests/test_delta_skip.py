"""Delta data skipping by add-action stats: the double-encoded stats
JSON, non-vacuous class coverage, conservative no-stats handling, the
carried-twice numRecords audit, and the oracle compare."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.deltaskip import (
    delta_skip_log_lines,
    delta_stats_skip_fold,
)

NV = 30


def test_every_class_nonvacuous_and_consistent(spark):
    rows = {r["class"]: r for r in
            delta_stats_skip_fold(spark, NV).collect()}
    assert set(rows) == {"skip_low", "skip_high", "scan", "no_stats"}
    assert all(r["n_files"] > 0 for r in rows.values())
    assert all(r["stats_ok"] == 1 for r in rows.values())
    # the classifier partitions the live set exactly:
    # live(nv-1) = {nv-2 .. 2*nv} → 2 + nv + 2 files... computed:
    assert sum(r["n_files"] for r in rows.values()) == (2 * NV) - (NV - 2) + 1
    # no_stats = live fids with fid % 5 == 2
    assert rows["no_stats"]["n_files"] == len(
        [f for f in range(NV - 2, 2 * NV + 1) if f % 5 == 2])


def test_stats_are_double_encoded_json(spark):
    """The protocol detail: stats is a JSON string INSIDE the action
    JSON — the raw line must contain an escaped inner document."""
    lines = (delta_skip_log_lines(spark, NV)
             .filter(F.col("line").contains('"stats"'))
             .limit(3).collect())
    assert lines
    for r in lines:
        assert '\\"numRecords\\"' in r["line"]


def test_missing_stats_scan_conservatively(spark):
    """A skipper that drops no-stats files loses data: the no_stats
    class must carry positive row totals (they WILL be scanned)."""
    rows = {r["class"]: r for r in
            delta_stats_skip_fold(spark, NV).collect()}
    assert rows["no_stats"]["rows_total"] > 0
    assert rows["no_stats"]["null_count"] == 0  # unknown → 0, not guessed


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "delta_stats_skipping")
